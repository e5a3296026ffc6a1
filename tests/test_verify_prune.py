"""Round-9 optimization guard: the candidate-verify operators keep the
whole-corpus shingle projection BELOW the candidate join
(_paired_shingles) — the filter above the join then references plain
join-output attributes, so predicate pushdown cannot clone the shingle
walk into the join condition (the measured-4×-worse post-join shape).
Values must be unchanged vs a members-only shingle pass.

The full-hash oracle replay (test_oracle.py: jaccard_pairs,
containment_pairs) is the end-to-end gate; this test pins the operator
internals so a refactor can't silently reintroduce corpus-wide
shingling or change pair semantics.
"""
import pytest
from pyspark.sql import functions as F

from graphydb_spark.operators import dedup


@pytest.fixture(scope="module")
def corpus(spark):
    # docs 0/1 are a near-dup pair; 3/4 are near-dups of 0 but appear in
    # NO candidate pair (they must not leak into output or change the
    # scores of the docs that do appear)
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "the quick brown fox jumps over the lazy cat tonight"),
        (2, "completely different content about spark engines today"),
        (3, "the quick brown fox jumps over the lazy dog tonight"),
        (4, "the quick brown fox jumps over the lazy dog sometimes"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def pairs(spark):
    return spark.createDataFrame([(0, 1), (0, 2)], "id_a long, id_b long")


def _members_only_expected(docs, pairs, op, **kw):
    """The pre-round-9 semantics: inner joins on id_a/id_b ignore
    unpaired docs, so restricting docs to pair members by hand
    reproduces the old whole-corpus result exactly."""
    members = {r[0] for r in pairs.select("id_a").collect()} | \
              {r[0] for r in pairs.select("id_b").collect()}
    return op(docs.where(F.col("doc_id").isin(list(members))), pairs, **kw)


def test_jaccard_verify_value_identity(corpus, pairs):
    got = sorted(dedup.jaccard_verify(corpus, pairs, threshold=0.0)
                 .collect())
    exp = sorted(_members_only_expected(corpus, pairs,
                                        dedup.jaccard_verify,
                                        threshold=0.0).collect())
    assert got == exp
    ids = {i for r in got for i in (r["id_a"], r["id_b"])}
    assert ids <= {0, 1, 2}          # unpaired docs never leak
    vals = {(r["id_a"], r["id_b"]): r["jaccard"] for r in got}
    # 8-shingle sets, 6 common, union 10 → 0.6
    assert vals[(0, 1)] == pytest.approx(0.6)


def test_containment_value_identity(corpus, pairs):
    got = sorted(dedup.containment_pairs(corpus, pairs, threshold=0.0)
                 .collect())
    exp = sorted(_members_only_expected(corpus, pairs,
                                        dedup.containment_pairs,
                                        threshold=0.0).collect())
    assert got == exp
    assert len(got) == 2             # one row per candidate pair


def test_shingle_pass_is_spread_and_below_the_join(spark, corpus, pairs):
    plan = dedup.jaccard_verify(corpus, pairs, threshold=0.0) \
        ._jdf.queryExecution().executedPlan().toString()
    # shingling stays BELOW the join (a post-join shingle projection
    # lets predicate pushdown clone the walk into the join condition)
    assert "zip_with" in plan and "Join" in plan
    assert plan.index("Join") < plan.index("zip_with")
    # the spread helper fans a collapsed scan out to every core and
    # leaves an already-parallel input untouched
    par = spark.sparkContext.defaultParallelism
    assert dedup._spread_small_scan(corpus.coalesce(1)) \
        .rdd.getNumPartitions() >= par
    wide = corpus.repartition(par * 2)
    assert dedup._spread_small_scan(wide) is wide


def test_no_row_duplication_on_repeated_members(spark, corpus):
    # doc 0 appears in BOTH pairs: the per-occurrence shingling must
    # keep exactly one output row per candidate pair
    pairs = spark.createDataFrame([(0, 1), (0, 2), (1, 2)],
                                  "id_a long, id_b long")
    out = dedup.jaccard_verify(corpus, pairs, threshold=0.0).collect()
    assert len(out) == 3
    assert len({(r["id_a"], r["id_b"]) for r in out}) == 3


def test_minimal_shingle_doc(spark):
    # exactly k tokens → one shingle; identical docs score 1.0 (a
    # sub-k-token doc has an EMPTY shingle set and 0/0 raises under
    # ANSI mode in both the old and new shapes — unchanged contract:
    # candidate generators only emit docs with ≥1 shingle)
    docs = spark.createDataFrame([(0, "a b c"), (1, "a b c")],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    out = dedup.jaccard_verify(docs, pairs, threshold=0.0).collect()
    assert len(out) == 1 and out[0]["jaccard"] == 1.0
