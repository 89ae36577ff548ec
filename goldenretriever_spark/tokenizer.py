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

# Explicit ASCII whitespace class: Java regex \s, RE2 \s (DuckDB oracle) and
# Python str.split() disagree at the edges (\x0b membership, Unicode
# whitespace like NBSP/ ) — the explicit class below is identical in all
# three engines, so rank-identity holds on real-world input, not just the
# ASCII-only driver corpora. SIMPLE_SPLIT_SQL is the escaped twin for
# embedding in DuckDB oracle SQL.
SIMPLE_SPLIT_RE = "[ \t\n\x0b\f\r]+"
SIMPLE_SPLIT_SQL = r"[ \t\n\x0b\f\r]+"

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


_WORD_BREAK_RE = re.compile(r"[\W_]+", re.UNICODE)  # punct + underscore -> space
_MN_TABLE: dict[int, None] | None = None


def _mn_translate_table() -> dict[int, None]:
    """str.translate table deleting every combining mark (category Mn),
    built once per Python worker (~0.3 s over the full codepoint range) so
    the batch path never calls unicodedata per character."""
    global _MN_TABLE
    if _MN_TABLE is None:
        _MN_TABLE = {
            cp: None for cp in range(0x110000) if unicodedata.category(chr(cp)) == "Mn"
        }
    return _MN_TABLE


def code_tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized batch tokenizer: the same steps as ``code_tokenize_text``
    re-expressed as pandas ``.str`` pipeline ops over the whole Arrow batch
    (C-speed regex + translate — no per-character Python loop; the scalar
    twin stays as the semantics anchor and the equivalence is pytest-locked).
    Camel-boundary spaces are inserted BEFORE punctuation removal — the
    lookarounds only see adjacent alnum chars, so boundary positions are
    identical to the scalar's split-then-camel order. Unique-value
    memoization retained (query batches and driver corpora repeat)."""
    uniq = texts.dropna().unique()
    u = pd.Series(uniq, dtype=object)
    u = u.str.replace(_CONTROL_RE, " ", regex=True)
    u = u.str.normalize("NFD")
    u = u.str.translate(_mn_translate_table())
    u = u.str.replace(_CJK_RE, r" \1 ", regex=True)
    u = u.str.replace(_CAMEL_RE, " ", regex=True)
    u = u.str.replace(_WORD_BREAK_RE, " ", regex=True)
    toks = u.str.lower().str.split()
    table = dict(zip(uniq, toks))
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
