"""Port of the reference's FriendGraphTests golden assertions
(/root/reference/tests/test_graphdb.py:27-161, facts per FIXTURES.md §1)."""

import pytest

from graphydb_spark import Graph, NSet

from .conftest import build_friend_graph


@pytest.fixture(scope="module")
def fg(spark):
    g = Graph(spark)
    people = build_friend_graph(g)
    return g, people


def test_stats(fg):
    g, _ = fg
    s = g.stats
    assert s["nodes"] == 6 and s["edges"] == 10
    assert s["edgekinds"] == {"Likes": 6, "Follows": 4}
    assert s["nodekinds"] == {"Person": 6}


def test_degrees_bob(fg):
    g, p = fg
    bob = p["Bob"]
    assert len(bob.inE()) == 2
    assert len(bob.outE()) == 3
    assert len(bob.inN()) == 1
    assert len(bob.outN()) == 3
    assert bob.bothE(COUNT=True) == 5
    assert bob.bothN(COUNT=True) == 3
    # COUNT path must agree with len path (tests/test_graphdb.py:89-105)
    assert len(bob.bothE()) == 5
    assert len(bob.bothN()) == 3


def test_three_hop_closure(fg):
    g, p = fg
    frontier = NSet([p["Bob"]])
    for _ in range(3):
        frontier = frontier.bothN()
    assert len(frontier) == 6  # reaches everyone


def test_group_by_likes_counts(fg):
    g, _ = fg
    res = g.fetch("[p:Person,likecount] -(e:Likes)> (n2)",
                  GROUP="p.uid", likecount="COUNT(e.uid)")
    counts = sorted(n["_likecount"] for n in res)
    assert counts == [1, 1, 2, 2]


def test_fts_prefix(fg):
    g, _ = fg
    res = g.fetch("(n)", n_fts="An*")
    assert [n["name"] for n in res] == ["Anne"]


def test_glob_on_name(fg):
    g, _ = fg
    res = g.fetch("(n:Person)", "n.data.name GLOB 'B*'")
    assert [n["name"] for n in res] == ["Bob"]


def test_collect_link_equals_start(fg):
    """fetch('[n1] -(e:Likes)>') ≡ fetch('-(e:Likes)>').start
    (tests/test_graphdb.py:112-115)."""
    g, _ = fg
    a = g.fetch("[n1] -(e:Likes)> (n2)")
    b = g.fetch("(n1) -(e:Likes)> (n2)")  # collects n2
    starts = g.fetch("-(e:Likes)>").start
    assert a == starts
    assert set(a.uids()) == set(starts.uids())
    assert a != b or set(a.uids()) == set(b.uids())


def test_eset_end(fg):
    g, p = fg
    ends = g.fetch("-(e:Follows)>").end
    names = sorted(n["name"] for n in ends)
    assert names == ["Bob", "Charlotte", "Eugene", "Fred"]


def test_limit(fg):
    g, _ = fg
    assert len(g.fetch("(n)", LIMIT=3)) == 3


def test_lambda_filter(fg):
    g, _ = fg
    res = g.fetch("(n:Person)").filter(lambda n: n["name"].startswith("D"))
    assert [n["name"] for n in res] == ["Dirk"]
    # items raising inside the filter are silently dropped
    res = g.fetch("(n:Person)").filter(lambda n: n["nope"] == 1)
    assert len(res) == 0


def test_filter_fnmatch(fg):
    g, _ = fg
    res = g.fetch("(n:Person)").filter_fnmatch(name="*e")
    assert sorted(n["name"] for n in res) == ["Anne", "Charlotte", "Eugene"]


def test_client_sort(fg):
    g, _ = fg
    res = g.fetch("(n:Person)")
    res.sort(key=lambda n: n["name"], reverse=True)
    assert [n["name"] for n in res][:2] == ["Fred", "Eugene"]


def test_extra_projection(fg):
    g, _ = fg
    res = g.fetch("[p:Person,uname] (p2)"
                  if False else "[p:Person,uname]", uname="UPPER(p.data.name)")
    assert sorted(n["_uname"] for n in res)[0] == "ANNE"


def test_save_readback(fg):
    g, p = fg
    extra = g.Node("Person", name="Zed", mood="curious").save()
    back = g.getuid(extra.uid)
    assert back["name"] == "Zed" and back["mood"] == "curious"
    # cleanup so other module tests see the original counts
    extra.delete()


def test_unconnected_difference(fg):
    """Isolated node found via set difference (tests/test_graphdb.py:125-132)."""
    g, _ = fg
    loner = g.Node("Person", name="Loner").save()
    connected = g.fetch("[n1] -(e)> (n2)") | g.fetch("(n1) -(e)> [n2]")
    alone = g.fetch("(n)") - connected
    assert [n["name"] for n in alone] == ["Loner"]
    loner.delete()


def test_set_anchored_traversal_single_join(fg):
    g, p = fg
    ns = NSet([p["Anne"], p["Bob"]])
    out = ns.outN()
    assert sorted(n["name"] for n in out) == \
        ["Anne", "Bob", "Charlotte", "Eugene", "Fred"]
    assert ns.outE(COUNT=True) == 6  # Anne:3 + Bob:3


def test_optional_edge_counts_include_zero(fg):
    """Beyond-reference OPTIONAL MATCH: '-(e?:Likes)>' left-joins, so
    every Person appears — including the two with zero outgoing Likes
    (the inner-join form above returns only the 4 likers)."""
    g, _ = fg
    res = g.fetch("[p:Person,likecount] -(e?:Likes)> (n2)",
                  GROUP="p.uid", likecount="COUNT(e.uid)")
    counts = sorted(n["_likecount"] for n in res)
    assert counts == [0, 0, 1, 1, 2, 2]


def test_optional_edge_null_extension(fg):
    """Rows matched through the optional edge carry real values; rows
    without a match survive with a null extra.  (as_df: the ItemSet
    form would dedup by uid — reference NSet semantics.)"""
    import json as _json
    g, _ = fg
    df = g.fetch("[p:Person,liked] -(e?:Likes)> (n2)",
                 liked="n2.data.name", as_df=True)
    by_person = {}
    for r in df.collect():
        name = _json.loads(r["props"])["name"]
        by_person.setdefault(name, set()).add(r["liked"])
    assert by_person["Eugene"] == {None}       # likes nobody
    assert by_person["Fred"] == {None}
    assert by_person["Anne"] == {"Bob"}
    assert by_person["Bob"] == {"Anne", "Charlotte"}


def test_optional_edge_parse_errors(fg):
    g, _ = fg
    import pytest as _pytest
    from graphydb_spark.items import GraphydbError
    with _pytest.raises(GraphydbError):
        g.fetch("(a?) -(e)> (b)")              # node marked optional
    with _pytest.raises(GraphydbError):
        g.fetch("(a) -[e?:Likes]> (b)")        # optional collect link
