"""Int-key join rewrite: adversarial interactions with string-uid
predicates, binds, and extras.  Metamorphic ground truth: clearing the
integrity declarations disables the rewrite (and join elimination), and
every query must return the identical uid set either way."""

import pytest

from graphydb_spark.sources.tpch_graph import tpch_graph

SF = "/root/testdata/sf0.001"

CASES = [
    # string-uid equality predicate on a joined link
    ("[c:Customer] -(pl:Placed)> (o:Order)", "o.uid = 'Order:7'", {}),
    # GLOB on uid across an int-key join
    ("[c:Customer] -(pl:Placed)> (o:Order)", "o.uid GLOB 'Order:1?'", {}),
    # bind-parameter anchor on an edge endpoint column (traversal shape)
    ("-(e:Placed)> [o:Order]", "e.startuid = :u", {"u": "Customer:3"}),
    # cross-alias extra keeps full-row DISTINCT; uid join only partially
    # rewritten (collect side typed, extra references other alias)
    ("[c:Customer,okey] -(pl:Placed)> (o:Order)", "o.uid < 'Order:2'",
     {"okey": "o.uid"}),
    # mixed: one declared junction (int), one untyped node link (string)
    ("(r:Region) <(ir:InRegion)- (n) <(fn:FromNation)- [c:Customer]",
     "r.uid = 'Region:0'", {}),
]


def test_bad_where_raises_graphydb_error_with_context(spark):
    from graphydb_spark.items import GraphydbError
    g = tpch_graph(spark, SF, cache=False)
    with pytest.raises(GraphydbError) as exc:
        g.fetch("(c:Customer)", "c.data.x !!!@ not sql")
    msg = str(exc.value)
    assert "CHAIN" in msg and "WHERE" in msg and "SQL" in msg


@pytest.mark.parametrize("chain,where,params", CASES)
@pytest.mark.slowtier
def test_int_key_rewrite_metamorphic(spark, chain, where, params):
    g = tpch_graph(spark, SF, cache=False)
    with_keys = {tuple(sorted(r.asDict().items()))
                 for r in g.fetch(chain, where, as_df=True, **params)
                 .select("uid").collect()}
    sql, _ = g.fetch(chain, where, DEBUG=True, **params)
    g._edge_integrity = {}
    g._edge_unique = {}
    without = {tuple(sorted(r.asDict().items()))
               for r in g.fetch(chain, where, as_df=True, **params)
               .select("uid").collect()}
    assert with_keys == without and with_keys
    # sanity: the declared form actually used an int junction somewhere
    assert (".skey" in sql or ".ekey" in sql or ".nkey" in sql)
