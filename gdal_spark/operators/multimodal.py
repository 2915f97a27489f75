"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The training-data pipeline treats images/audio/video as opaque
`binary` columns with typed metadata extracted by Arrow-batched UDFs
(SURVEY training-data ops). This container has no image/audio codecs,
so the DECODE step is stubbed — but the Spark-side plumbing (schema,
batching, partitioning, UDF signature) is real and tested:

 - `extract_meta` runs `mapInPandas` over (id, payload) batches and
   returns (id, n_bytes, is_html, feat): byte length, a magic-prefix
   probe, and a deterministic feature derived from the real bytes —
   the stand-in for an embedding/feature vector.
 - `decode_image` is the marked stub: it validates the batch path and
   raises NotImplementedError at the point a codec would run.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_META = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("is_html", T.BooleanType(), False),
    T.StructField("feat", T.LongType(), False),
])

FEAT_MULT = 2654435761
FEAT_MOD = 1000003


def extract_meta(df: DataFrame, id_col: str = "doc_id",
                 bin_col: str = "html") -> DataFrame:
    """Typed metadata per binary payload, Arrow-batched."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, mag, feat = [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob)
                ids.append(int(i))
                nb.append(len(b))
                mag.append(b[:12] == b"<html><body>")
                feat.append((len(b) * FEAT_MULT) % FEAT_MOD)
            yield pd.DataFrame({"doc_id": ids, "n_bytes": nb,
                                "is_html": mag, "feat": feat})

    return df.select(id_col, bin_col).mapInPandas(run, _META)


def decode_image(df: DataFrame, bin_col: str = "payload"):
    """STUB: the real decode (PIL/libjpeg) is unavailable in this
    environment. The mapInPandas harness below is the production
    shape; it fails loudly at the codec call."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                raise NotImplementedError(
                    "image decode requires a codec library not present "
                    "in this environment; plug a decoder into "
                    "operators.multimodal.decode_image")
            yield pd.DataFrame({"doc_id": []})

    return df.mapInPandas(run, T.StructType([T.StructField("doc_id", T.LongType())]))
