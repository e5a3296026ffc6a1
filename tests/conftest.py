import os

import pytest

from graphydb_spark import Graph, get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="graphydb_spark_tests",
                  cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture()
def graph(spark):
    return Graph(spark)


def build_friend_graph(g: Graph):
    """The reference's FriendGraphTests fixture
    (/root/reference/tests/test_graphdb.py:29-56 via FIXTURES.md §1)."""
    people = {}
    for name in ["Anne", "Bob", "Charlotte", "Dirk", "Eugene", "Fred"]:
        people[name] = g.Node("Person", name=name).save()
    likes = [("Anne", "Bob"), ("Bob", "Charlotte"), ("Bob", "Anne"),
             ("Dirk", "Eugene"), ("Dirk", "Fred"), ("Charlotte", "Eugene")]
    follows = [("Anne", "Eugene"), ("Bob", "Fred"), ("Fred", "Charlotte"),
               ("Anne", "Bob")]
    for s, e in likes:
        g.Edge(people[s], "Likes", people[e]).save()
    for s, e in follows:
        g.Edge(people[s], "Follows", people[e]).save()
    g.resetfts(nodefields=["name"])
    return people


def build_complete_graph(g: Graph, n: int = 10):
    """K_n complete digraph including self-loops
    (tests/test_graphdb.py:165-174 via FIXTURES.md §2)."""
    nodes = [g.Node("Person", idx=i).save() for i in range(n)]
    for a in nodes:
        for b in nodes:
            g.Edge(a, "E", b).save()
    return nodes


def build_example_graph(g: Graph):
    """The README example graph (tests/test_graphdb.py:212-240 via
    FIXTURES.md §3): 5 nodes, 6 edges, 11 creation change records."""
    anne = g.Node("Person", name="Anne", age=22).save()
    bob = g.Node("Person", name="Bob", age=19, nickname="Bobby").save()
    charlie = g.Node("Person", name="Charlie", age=31).save()
    coffee = g.Node("Drink", sort="Coffee").save()
    tea = g.Node("Drink", sort="Coffee").save()   # sic — FIXTURES.md §3
    g.Edge(anne, "Likes", bob).save()
    g.Edge(charlie, "Likes", bob).save()
    g.Edge(anne, "Drinks", coffee, strength="strong").save()
    g.Edge(charlie, "Drinks", tea).save()
    g.Edge(bob, "Drinks", tea, strength="strong", preference=1).save()
    g.Edge(bob, "Drinks", coffee, strength="weak", preference=0).save()
    return dict(anne=anne, bob=bob, charlie=charlie, coffee=coffee, tea=tea)
