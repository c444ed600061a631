"""HTTP entity decode — gzip + charset, Arrow-vectorized.

Reference: DefaultHttpFacade.scala:44-57 installs a gzip response
interceptor (Content-Encoding: gzip bodies are wrapped in a
GzipDecompressingEntity) and :73,:116 decode the entity bytes with the
response charset (UTF-8 default). In the engine the corpus can store
bodies compressed (``body_gz:binary`` + ``content_encoding`` + ``charset``
columns); this stage inflates and decodes them in Arrow batches right
after the fetch join — zero per-row Python registration, one pandas_udf.

Decode failures yield a null body (the reference logs + returns null on
entity errors, DefaultHttpFacade.scala:75-82), which P3 then routes to
dead-feed / skipped-item exactly like a non-200.
"""

from __future__ import annotations

import gzip
import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def decode_body_udf(
    raw: pd.Series, encoding: pd.Series, charset: pd.Series
) -> pd.Series:
    out = []
    for b, enc, cs in zip(raw, encoding, charset):
        if b is None:
            out.append(None)
            continue
        try:
            data = bytes(b)
            if enc == "gzip":
                data = gzip.decompress(data)
            elif enc == "deflate":
                data = zlib.decompress(data)
            out.append(data.decode(cs or "utf-8"))
        except Exception:
            out.append(None)  # entity error -> null body (P3 routes it)
    return pd.Series(out)


def decode_body(raw: Column, encoding: Column, charset: Column) -> Column:
    return decode_body_udf(raw, encoding, charset)


# ---------------------------------------------------------------- python mirror


def decode_body_py(raw: bytes | None, encoding: str | None,
                   charset: str | None) -> str | None:
    if raw is None:
        return None
    try:
        data = bytes(raw)
        if encoding == "gzip":
            data = gzip.decompress(data)
        elif encoding == "deflate":
            data = zlib.decompress(data)
        return data.decode(charset or "utf-8")
    except Exception:
        return None
