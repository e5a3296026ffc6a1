"""Round-9 optimization guard: the candidate-verify operators prune the
corpus to pair members BEFORE shingling (_pair_member_prune) — values
must be unchanged and the semi-join must actually be in the plan.

The full-hash oracle replay (test_oracle.py: jaccard_pairs,
containment_pairs) is the end-to-end gate; this test pins the operator
internals so a refactor can't silently drop the prune or, worse, turn
it into an inner join that duplicates rows.
"""
import pytest
from pyspark.sql import functions as F

from graphydb_spark.operators import dedup


@pytest.fixture(scope="module")
def corpus(spark):
    # docs 0/1 are a near-dup pair; 3/4 are near-dups of 0 but appear in
    # NO candidate pair (the prune must not let them leak into output,
    # and must not change the scores of the docs that do appear)
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


def _unpruned_expected(docs, pairs, op, **kw):
    """The pre-round-9 shape: shingle the WHOLE corpus, join onto pairs.

    Restricting docs to pair members by hand reproduces it exactly
    (inner joins on id_a/id_b ignore unpaired docs by definition)."""
    members = {r[0] for r in pairs.select("id_a").collect()} | \
              {r[0] for r in pairs.select("id_b").collect()}
    return op(docs.where(F.col("doc_id").isin(list(members))), pairs, **kw)


def test_jaccard_verify_prune_value_identity(corpus, pairs):
    got = sorted(dedup.jaccard_verify(corpus, pairs, threshold=0.0)
                 .collect())
    exp = sorted(_unpruned_expected(corpus, pairs, dedup.jaccard_verify,
                                    threshold=0.0).collect())
    assert got == exp
    ids = {i for r in got for i in (r["id_a"], r["id_b"])}
    assert ids <= {0, 1, 2}          # unpaired docs never leak


def test_containment_prune_value_identity(corpus, pairs):
    got = sorted(dedup.containment_pairs(corpus, pairs, threshold=0.0)
                 .collect())
    exp = sorted(_unpruned_expected(corpus, pairs, dedup.containment_pairs,
                                    threshold=0.0).collect())
    assert got == exp
    assert len(got) == 2             # one row per candidate pair


def test_prune_is_a_semi_join_in_the_plan(corpus, pairs):
    plan = dedup.jaccard_verify(corpus, pairs, threshold=0.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_prune_no_row_duplication_on_repeated_members(spark, corpus):
    # doc 0 appears in BOTH pairs: the semi join must not duplicate it
    pairs = spark.createDataFrame([(0, 1), (0, 2), (1, 2)],
                                  "id_a long, id_b long")
    out = dedup.jaccard_verify(corpus, pairs, threshold=0.0).collect()
    assert len(out) == 3
    assert len({(r["id_a"], r["id_b"]) for r in out}) == 3
