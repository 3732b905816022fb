"""Driver-style oracle gates for the queries whose parity depends on
deliberate gate DESIGN rather than plain SQL translation: engine-
specific machinery made self-verifying (LSH buckets, SimHash bands,
HLL, hyperplane/IVF ANN — recall/agreement gates) plus the paths with
cross-engine representation traps (streaming sliding windows: epoch
flooring; multimodal metadata: blob-hash portability). These tests run
the SAME DuckDB oracle the round driver runs, at sf0.001 (the driver
gates at sf0.01 — both verified)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from vinum_spark.inventory import QUERIES, oracle_sql

SF_DIR = "/root/testdata/sf0.001"

#: Queries whose parity depends on deliberate gate DESIGN rather than
#: plain SQL translation — recall/agreement constructions, streaming
#: drains, decoders, AQE plan pins. These re-verify at sf0.001 here
#: EVEN when they sit inside the driver's 50-query head (the driver
#: gates at sf0.01; running the design-sensitive gates at a second
#: scale catches scale-dependent drift). Everything OUTSIDE the head
#: is added automatically below — the round-14 review found the old
#: hand-maintained tail both missed four queries (q25/q28/q40/q43)
#: and double-ran 39 head members whose oracles are plain SQL.
_ENGINE_DESIGNED = [
    "q29_minhash_lsh_dedup",    # banded-LSH recall construction
    "q53_streaming_stateful_dedup",  # applyInPandasWithState drain
    "q54_winnowing_pairs",      # rolling-hash winnowing selection
    "q55_stream_interval_join", # watermarked stream-stream join
    "q56_embedding_lsh_verify", # hyperplane-LSH candidates + verify
    "q57_skew_salted_agg",      # salting construction
    "q58_quality_rules",        # lambda-HOF + regex parity
    "q75_prepare_corpus",       # composed survivor chain
    "q81_audio_decode",         # closed-form sample-decode gates
    "q84_vorbis_decode",
    "q86_skew_join_aqe",        # AQE skew-split plan behavior
    "q87_image_phash_neardup",  # banded hamming LSH + auto knob
    "q90_bpe_byte_merges",      # greedy-merge chain parity
    "q95_pipeline_tokenized",   # full tokenizing pipeline chain
    "q98_pipeline_stream",      # streaming pipeline drains, both
    "q99_pipeline_stream_rocksdb",  # state-store providers
    "q102_pack_token_blocks",   # md5-stream block arithmetic
    "q103_stream_store_dedup",  # foreachBatch persistent-store dedup
]

# every query outside the driver's head runs its exact oracle here —
# derived, so a rotation can never orphan a query again
from vinum_spark.inventory import _GATE_HEAD  # noqa: E402

GATED = sorted(set(_ENGINE_DESIGNED) | (set(QUERIES) - set(_GATE_HEAD)))


@pytest.fixture(scope="module")
def oracle_con():
    from vinum_spark.inventory import TABLES

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", GATED)
def test_gate_matches_duckdb_oracle(spark, oracle_con, name):
    sdf = QUERIES[name].fn(spark, SF_DIR).toPandas()
    odf = oracle_con.execute(oracle_sql()[name]).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert s.shape == o.shape
    for c in cols:
        if s[c].dtype.kind in "fciu":
            assert np.allclose(
                s[c].astype("float64"), o[c].astype("float64")
            ), c
        else:
            assert (s[c].astype(str) == o[c].astype(str)).all(), c


def test_every_query_has_an_oracle():
    """Round-3 contract: zero rows-only checks left in the inventory."""
    missing = [n for n in QUERIES if n not in oracle_sql()]
    assert missing == []


def test_every_non_gate_query_runs_its_oracle_in_suite():
    """Structural invariants behind the gate rotation: the driver
    records only the FIRST 50 entries of queries(), so (a) _GATE_HEAD
    must be EXACTLY 50 names — a 51st entry would silently fall
    outside both the driver window and the derived suite complement
    (round-14 review finding) — and (b) every query outside it must
    run its exact driver oracle here. GATED is derived from the
    complement, so (b) holds by construction; this pins it against
    refactors."""
    from vinum_spark.inventory import _GATE_HEAD, _gate_order

    assert len(_GATE_HEAD) == 50
    assert len(set(_GATE_HEAD)) == 50
    assert _gate_order()[:50] == list(_GATE_HEAD)
    outside = set(QUERIES) - set(_GATE_HEAD)
    uncovered = sorted(outside - set(GATED))
    assert uncovered == []
