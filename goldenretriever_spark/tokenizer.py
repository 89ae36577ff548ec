"""Tokenizers: the engine's single extension point (reference analog: the
``Encoder`` ABC, /root/reference/src/encoders.py:17-39).

Two built-in tokenizers:

- ``simple``: lowercase + split on whitespace runs. Implemented as pure
  Catalyst column expressions (``lower`` / ``split`` / ``filter``) — zero
  Python in the hot path, stays inside whole-stage codegen, and is exactly
  expressible in ANSI SQL so the DuckDB oracle can mirror it bit-for-bit.

- ``code``: code-aware tokenization modeled on the reference's BasicTokenizer
  (/root/reference/src/tokenizers/bert_tokenization.py:268-380 — lowercase
  :295-297, accent strip :303-312, punctuation split :314-332, CJK isolation
  :334-345, control-char clean :369-380) extended with camelCase / snake_case
  sub-token splitting for source code. Implemented as a VECTORIZED pandas UDF
  (Arrow-batched Series->Series; input_hint requires "no per-row Python" —
  regex work happens via pandas .str ops over whole Arrow batches).

The same pure-pandas function (``code_tokenize_series``) backs both the Spark
UDF and the single-node oracle, so rank-identity tests compare execution
engines, not tokenizer variants.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

SIMPLE_SPLIT_RE = r"\s+"

# Unicode-aware: \w in Python covers letters+digits+underscore across scripts.
_PUNCT_SPLIT_RE = re.compile(r"[^\w]+", re.UNICODE)
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")
_CJK_RE = re.compile(
    "([一-鿿㐀-䶿豈-﫿぀-ヿ가-힯])"
)
_CONTROL_RE = re.compile(r"[\x00�]")


def simple_tokens(col: Column) -> Column:
    """lowercase + whitespace split as a Catalyst array<string> expression.

    ``split`` on a whitespace run yields '' elements at the string edges;
    ``filter(x -> x != '')`` drops them JVM-side.
    """
    toks = F.split(F.lower(F.trim(col)), SIMPLE_SPLIT_RE)
    return F.filter(toks, lambda x: x != F.lit(""))


def code_tokenize_text(text: str) -> list[str]:
    """Scalar code-aware tokenizer (shared semantics anchor; the vectorized
    path calls this per unique string inside an Arrow batch)."""
    if text is None:
        return []
    s = _CONTROL_RE.sub(" ", text)
    # NFD normalize, drop combining marks (accent strip, bert_tokenization.py:303-312)
    s = unicodedata.normalize("NFD", s)
    s = "".join(ch for ch in s if unicodedata.category(ch) != "Mn")
    # isolate CJK chars as standalone tokens (bert_tokenization.py:334-345)
    s = _CJK_RE.sub(r" \1 ", s)
    out: list[str] = []
    for raw in s.split():
        # split on punctuation (keeps word chars incl. underscore)
        for w in _PUNCT_SPLIT_RE.split(raw):
            if not w:
                continue
            # snake_case -> parts; camelCase -> parts
            for piece in w.split("_"):
                if not piece:
                    continue
                for sub in _CAMEL_RE.split(piece):
                    if sub:
                        out.append(sub.lower())
    return out


def code_tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized batch tokenizer: amortizes work across an Arrow batch by
    tokenizing each *unique* string once (documents rarely repeat, but query
    batches and driver corpora do)."""
    uniq = texts.dropna().unique()
    table = {t: code_tokenize_text(t) for t in uniq}
    return texts.map(lambda t: table.get(t, []))


@F.pandas_udf(T.ArrayType(T.StringType()))
def code_tokens_udf(texts: pd.Series) -> pd.Series:
    return code_tokenize_series(texts)


def tokens_column(col: Column, tokenizer: str = "simple") -> Column:
    """Dispatch: tokenizer name -> array<string> Column."""
    if tokenizer == "simple":
        return simple_tokens(col)
    if tokenizer == "code":
        return code_tokens_udf(col)
    raise ValueError(f"unknown tokenizer: {tokenizer!r} (use 'simple' or 'code')")
