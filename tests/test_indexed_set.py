"""Differential tests of IndexedSet vs Python's native set — the
reference's own oracle strategy (/root/reference/tests/test_indexedset.py:
24-95) with seeded randomness, plus list-semantics tests (:97-171).
No Spark needed."""

import random

import pytest

from graphydb_spark.sets import IndexedSet


class V:
    """Value with uid identity = its integer value (collisions intended)."""

    def __init__(self, v):
        self.v = v

    def __uid__(self):
        return str(self.v)

    def __repr__(self):
        return f"V({self.v})"

    def __lt__(self, other):
        return self.v < other.v


def rand_lists(seed):
    rng = random.Random(seed)
    return [[V(rng.randint(1, 40)) for _ in range(30)] for _ in range(3)]


def as_native(xs):
    return {x.__uid__() for x in xs}


@pytest.mark.parametrize("seed", range(8))
def test_set_ops_match_native(seed):
    A, B, C = rand_lists(seed)
    ia, ib, ic = IndexedSet(A), IndexedSet(B), IndexedSet(C)
    sa, sb, sc = as_native(A), as_native(B), as_native(C)

    assert set((ia | ib).keys()) == sa | sb
    assert set((ia & ib).keys()) == sa & sb
    assert set((ia - ib).keys()) == sa - sb
    assert set((ia ^ ib).keys()) == sa ^ sb
    assert set(ia.union(ib, ic).keys()) == sa | sb | sc
    assert set(ia.intersection(ib, ic).keys()) == sa & sb & sc
    assert set(ia.difference(ib, ic).keys()) == sa - sb - sc

    assert (ia == ib) == (sa == sb)
    assert (ia <= ib) == (sa <= sb)
    assert (ia < ib) == (sa < sb)
    assert (ia >= ib) == (sa >= sb)
    assert (ia > ib) == (sa > sb)
    assert ia.isdisjoint(ib) == sa.isdisjoint(sb)
    # reflexive
    assert ia == ia and ia <= ia and ia >= ia and not ia < ia


def test_union_left_preference():
    """Duplicate uids keep the LEFT operand's item
    (graphydb.py:189-194, 427-447)."""
    a1, a2 = V(1), V(1)
    out = IndexedSet([a1]) | IndexedSet([a2])
    assert out["1"] is a1
    out2 = IndexedSet([a2]) | IndexedSet([a1])
    assert out2["1"] is a2


def test_add_vs_append():
    a1, a2 = V(1), V(1)
    s = IndexedSet([a1, V(2)])
    s.add(a2)                     # keeps position AND original item
    assert s["1"] is a1 and s.keys() == ["1", "2"]
    s.append(a2)                  # moves to end, replaces
    assert s["1"] is a2 and s.keys() == ["2", "1"]


def test_list_semantics():
    items = [V(i) for i in [5, 3, 9, 1]]
    s = IndexedSet(items)
    assert s[0].v == 5
    assert [x.v for x in s[1:3]] == [3, 9]
    assert s["9"].v == 9
    s.sort()
    assert [x.v for x in s] == [1, 3, 5, 9]
    s.reverse()
    assert [x.v for x in s] == [9, 5, 3, 1]
    popped = s.pop()
    assert popped.v == 1 and len(s) == 3
    s.remove(V(5))
    assert as_native(s) == {"9", "3"}
    with pytest.raises(KeyError):
        s.remove(V(42))
    s.discard(V(42))              # no raise
    del s[0]
    assert s.keys() == ["3"]
    s2 = s.copy()
    s2.clear()
    assert len(s) == 1 and len(s2) == 0


def test_membership_by_item_or_uid():
    s = IndexedSet([V(7)])
    assert V(7) in s and "7" in s and V(8) not in s


def test_item_fromkeys_and_ensure_list():
    from graphydb_spark.items import Item, ensure_list
    it = Item.fromkeys(["a", "b"], 0)
    assert it["a"] == 0 and it["b"] == 0 and it.changed
    assert "uid" in it and "ctime" in it
    assert ensure_list(None) == []
    assert ensure_list(3) == [3]
    assert ensure_list([3]) == [3]


def test_fromkeys_on_node_and_edge_subclasses():
    """Regression: fromkeys must not trip subclass constructor
    validation (kind/endpoints) — it builds a key template."""
    from graphydb_spark.items import Edge, Node
    n = Node.fromkeys(["kind", "name"], None)
    assert n["kind"] is None and n.changed
    e = Edge.fromkeys(["kind"], "Likes")
    assert e["kind"] == "Likes"
