"""Blanket plan hygiene over EVERY registered batch query: no
row-at-a-time Python evaluation nodes and no CartesianProduct anywhere —
the two anti-patterns that silently turn a scale-safe plan into a 100×
regression.  Family plan tests (test_plans.py) pin positive properties
per query; this sweep guarantees the negatives hold for queries added
later without their own plan test.

Streaming queries are excluded (calling them EXECUTES a stream rather
than building a plan); the two legitimate Arrow-batched Python stages
(HTTP enrichment, multimodal feature extraction) are allow-listed as
MapInPandas — which is the Arrow batch operator, not the row-at-a-time
BatchEvalPython these assertions reject.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from cybersecurity_ioc_etl_spark import plans as P

QUERIES = entrymod.queries()

# queries whose callable runs a real stream (drain + sink) — plan text
# is not obtainable without executing, and they have dedicated streaming
# tests; identified by prefix
_STREAMING_PREFIX = "stream_"

# queries with a sanctioned Arrow-batched Python stage (mapInPandas)
_PYTHON_STAGE_OK = {
    "enrichment_scraped_iocs",  # HTTP fetch+parse
    "media_byte_profile",  # multimodal feature extraction
    "frame_dedup_profile",  # frame-sampling UDTF shape
    "media_dhash_groups",  # native image decode → perceptual hash
    "media_dhash_neardup_pairs",  # same decode stage feeding the LSH join
    "audio_rms_profile",  # native WAV decode → frame energies (one Arrow map)
    "audio_silence_segments",  # same decode stage feeding the islands window
    "video_scene_cuts",  # native Y4M decode → pair deltas (one Arrow map)
    "image_patch_stats",  # native PPM decode → ViT-style patch sums
}

_BATCH_QUERIES = sorted(
    n for n in QUERIES if not n.startswith(_STREAMING_PREFIX)
)


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_no_python_rows_or_cartesian(spark, sf_dir, name):
    plan = P.formatted_plan(QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python"
    if name not in _PYTHON_STAGE_OK:
        assert "ArrowEvalPython" not in plan, f"{name}: python eval node"
        assert "MapInPandas" not in plan, f"{name}: unexpected python stage"
