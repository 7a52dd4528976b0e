"""Arrow-batched SimHash signature kernel (SURVEY.md §2.11 X2' — the
mapInPandas fast path for ``dedup.simhash(token_hash='poly')``).

Why a kernel: the expression path explodes tokens and runs 64 vote-sum
aggregates over them — one row per token through a shuffle, plus a
per-token ``F.aggregate`` codepoint fold for the oracle-mirrorable
polynomial hash (measured ~2x the xxhash64 variant at sf0.1).  The
kernel computes each document's 64-bit signature in ONE narrow Arrow
pass — no explode, no shuffle, no aggregation — with the SAME
polynomial arithmetic, so the output is value-identical to the
expression path and the registered DuckDB oracle keeps matching.

Vectorization: tokens from all documents in a batch are hashed
together, grouped by token length (each length group is one
(n_tokens, len) codepoint matrix folded column-wise mod the sub-2^53
prime — h*1009 + c stays under 2^63, int64-exact).  Bit votes are a
single (n_tokens, 64) bit matrix segment-summed per document with
``np.add.reduceat``.

Tokenizer mirror of ``text.tokens()`` (Spark semantics, exactly):
``trim`` strips ASCII spaces only; a fully-blank document produces NO
token rows, so — like the explode path — it is ABSENT from the output;
Java's ``\\s`` is ASCII-only, so the split class is written out; Spark's
``split`` (limit -1) keeps leading/trailing empty tokens when
non-space whitespace borders the trimmed string, and so does
``re.split`` — empty tokens hash as the zero-length polynomial (0),
identical in both engines.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from covid19i2b2_spark.operators.dedup import (
    _MERSENNE31,
    _POLY64_COEFFS,
    _POLY_BAND_P,
)

_P = np.int64(_POLY_BAND_P)
_M31 = np.int64(_MERSENNE31)
_B = np.int64(1009)
_WS = re.compile("[ \t\n\x0b\x0c\r]+")  # Java \s, written out


def _poly_token_hashes(tokens: list[str]) -> np.ndarray:
    """62-bit polynomial token hashes, vectorized by token length —
    the numpy mirror of ``dedup._poly_token_hash``: fold codepoints
    (acc*1009 + c) mod P, reduce mod 2^31-1, two affine maps fill bits
    0..30 and 32..62 (bits 31 and 63 always 0)."""
    n = len(tokens)
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    hp = np.zeros(n, dtype=np.int64)
    for length in np.unique(lens):
        if length == 0:
            continue  # zero-length fold is 0, already in place
        idx = np.nonzero(lens == length)[0]
        buf = "".join(tokens[i] for i in idx).encode("utf-32-le")
        cps = (
            np.frombuffer(buf, dtype=np.uint32)
            .astype(np.int64)
            .reshape(len(idx), length)
        )
        h = np.zeros(len(idx), dtype=np.int64)
        for j in range(length):
            h = (h * _B + cps[:, j]) % _P
        hp[idx] = h
    hp31 = hp % _M31
    (a1, b1), (a2, b2) = _POLY64_COEFFS
    # hp31 < 2^31, a < 2^31 -> products < 2^62; h1*2^32 < 2^63: int64-exact
    h1 = (hp31 * np.int64(a1) + np.int64(b1)) % _M31
    h2 = (hp31 * np.int64(a2) + np.int64(b2)) % _M31
    return h1 * np.int64(4294967296) + h2


def simhash_signatures_kernel(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Drop-in replacement for ``dedup.simhash(token_hash='poly')``:
    (id, simhash long, n_tokens) in one narrow mapInPandas pass.

    Parallelism note (same as the MinHash kernel): when the input scan
    has fewer partitions than defaultParallelism the narrow (id, text)
    projection is repartitioned first so the Python work spreads across
    all cores; wider-than-cluster inputs (the 100 TB case) pass through
    untouched."""
    id_field = df.schema[id_col]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        "simhash long, n_tokens long"
    )
    bit_idx = np.arange(64, dtype=np.int64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, toks_all, bounds, counts = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                t = (text or "").strip(" ")
                if t == "":
                    continue  # blank docs are absent, like the explode path
                toks = _WS.split(t)
                ids.append(doc_id)
                bounds.append(len(toks_all))
                toks_all.extend(toks)
                counts.append(len(toks))
            if not ids:
                yield pd.DataFrame(
                    {id_col: [], "simhash": [], "n_tokens": []}
                ).astype({"simhash": "int64", "n_tokens": "int64"})
                continue
            h64 = _poly_token_hashes(toks_all)
            bits = ((h64[:, None] >> bit_idx[None, :]) & 1).astype(np.int32)
            votes = np.add.reduceat(2 * bits - 1, np.array(bounds), axis=0)
            sig = ((votes > 0).astype(np.int64) << bit_idx[None, :]).sum(
                axis=1
            )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "simhash": sig,
                    "n_tokens": np.array(counts, dtype=np.int64),
                }
            )

    narrow = df.select(id_col, text_col)
    par = df.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < par:
        narrow = narrow.repartition(par)
    return narrow.mapInPandas(gen, schema)
