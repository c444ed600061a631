"""Caption extraction (U2) — pure built-in regexp, byte-exact.

Reference: Boilerpipe boilerplate stripping
(/root/reference/.../extraction/impl/BoilerpipeExtractor.scala:15-17). For
the image corpus the stage becomes caption extraction between the corpus's
caption markers; byte-exact equality vs the oracle is the input_hint gate.
Stays JVM-side (regexp_extract), no Python at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.synth.corpus import CAPTION_CLOSE, CAPTION_OPEN

import re as _re

_CAPTION_RE = f"(?s){_re.escape(CAPTION_OPEN)}(.*?){_re.escape(CAPTION_CLOSE)}"


def extract_caption(body: Column) -> Column:
    """First caption-marker span, or null when absent (P3: null extract ->
    item skipped, FeedManager.scala:142-145)."""
    return F.when(
        body.isNotNull() & body.rlike(_CAPTION_RE),
        F.regexp_extract(body, _CAPTION_RE, 1),
    )
