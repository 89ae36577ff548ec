.PHONY: test verify bench scale crossover package clean

crossover:
	python tools/wand_crossover.py 240000,960000,1920000 --runs=2

test:
	python -m pytest tests/ -x -q

verify:
	python tools/driver_sim.py

bench:
	python bench.py

scale:
	python tools/scaling_bench.py

package:
	python -c "from goldenretriever_spark.deploy import package_zip; print(package_zip())"

clean:
	rm -rf /tmp/goldenretriever_spark.zip .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
