"""Chain-pattern DSL → Spark SQL compiler.

The reference compiles its chain DSL (``'(n1) -(e:Likes)> (n2)'``) into a
single SQLite SELECT (parser /root/reference/graphydb.py:741-807, emitter
:809-1017).  This module re-implements the same *language* with a fresh
parser and compiles it to a Spark SQL SELECT over temp views, so Catalyst
owns optimization (predicate pushdown, join strategy, AQE) — the reference
delegates the same job to SQLite's planner.

Grammar (whitespace-separated tokens):

* node link:  ``(alias)`` | ``(alias:Kind)`` | ``[alias]`` |
  ``[alias:Kind,extra1,extra2]``  — square brackets mark the *collect* link
  (the link whose rows the query returns; default = right-most link), and
  may list extra output column names whose expressions arrive as kwargs.
* edge link (rightward):  ``-(e)>`` | ``-(e:Kind)>`` | ``-[e]>`` …
* edge link (leftward):   ``<(e)-`` | ``<(e:Kind)-`` | ``<[e]-`` …
* optional edge (beyond-reference): ``-(e?)>`` | ``-(e?:Kind)>`` —
  opens a LEFT-JOIN suffix (Cypher's OPTIONAL MATCH): the edge and
  every link after it are null-extended instead of filtering; kind
  predicates compile into the join's ON clause.  The collect link must
  be mandatory; aggregate extras over an optional alias express
  count-including-zero queries the reference DSL cannot.

Join semantics (graphydb.py:753-758): a rightward edge joins
``edge.startuid = leftnode.uid`` and continues from ``edge.enduid``; a
leftward edge joins ``edge.enduid = leftnode.uid`` and continues from
``edge.startuid``.

WHERE / ORDER / GROUP strings pass through to Spark SQL after two rewrites
(parity with graphydb.py:170-177 ``jsonextract`` and GLOB semantics):

* ``alias.data.key.sub`` → ``get_json_object(alias.props, '$.key.sub')``
* ``expr GLOB 'pat'``    → anchored case-sensitive RLIKE
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass, field
from typing import Optional

from .items import GraphydbError

#: clause keywords recognised by fetch (parity: graphydb.py:133)
FETCH_KEYWORDS = ("WHERE", "CHAIN", "ORDER", "LIMIT", "GROUP", "COUNT",
                  "DISTINCT", "OFFSET", "DEBUG")

NODE_COLS = ("uid", "kind", "ctime", "mtime", "props")
EDGE_COLS = ("uid", "kind", "startuid", "enduid", "ctime", "mtime", "props")


@dataclass
class Link:
    alias: str
    ltype: str                     # 'node' | 'redge' | 'ledge'
    kind: Optional[str] = None
    collect: bool = False
    extras: list = field(default_factory=list)
    #: beyond-reference extension: ``-(e?)>`` marks an OPTIONAL edge
    #: (LEFT JOIN — Cypher's OPTIONAL MATCH); nodes beyond an optional
    #: edge are absorbed into the optional suffix
    optional: bool = False
    #: ``-(e!)>`` marks an ANTI edge: keep rows where the whole suffix
    #: pattern has NO match (Cypher's WHERE NOT exists(...)); compiles
    #: to the LEFT-JOIN suffix + last-alias IS NULL
    anti: bool = False

    @property
    def is_edge(self) -> bool:
        return self.ltype in ("redge", "ledge")


_INNER_RE = re.compile(
    r"^(?P<open>[\(\[])"
    r"(?P<alias>[A-Za-z_]\w*)"
    r"(?P<opt>[?!])?"
    r"(?::(?P<kind>[A-Za-z_]\w*))?"
    r"(?P<extras>(?:,[A-Za-z_]\w*)*)"
    r"(?P<close>[\)\]])$"
)


def parse_chain(chain: str) -> list[Link]:
    """Parse a chain string into an ordered list of :class:`Link`.

    Errors mirror the reference (graphydb.py:788-791): malformed tokens and
    duplicate aliases raise.  Exactly one collect link is allowed; when none
    is bracketed, the right-most link collects (graphydb.py:804-806).
    """
    links: list[Link] = []
    seen: set[str] = set()
    for token in chain.split():
        body = token
        if token.startswith("<") and token.endswith("-"):
            ltype, body = "ledge", token[1:-1]
        elif token.startswith("-") and token.endswith(">"):
            ltype, body = "redge", token[1:-1]
        elif token.startswith("<") or token.endswith(">"):
            raise GraphydbError(f"Malformed chain token: {token!r}")
        else:
            ltype = "node"
        m = _INNER_RE.match(body)
        if not m:
            raise GraphydbError(f"Malformed chain token: {token!r}")
        if (m.group("open") == "(") != (m.group("close") == ")"):
            raise GraphydbError(f"Mismatched brackets in token: {token!r}")
        alias = m.group("alias")
        if alias in seen:
            raise GraphydbError(f"Duplicate alias in chain: {alias!r}")
        seen.add(alias)
        extras = [e for e in m.group("extras").split(",") if e]
        links.append(Link(alias=alias, ltype=ltype, kind=m.group("kind"),
                          collect=m.group("open") == "[", extras=extras,
                          optional=m.group("opt") is not None,
                          anti=m.group("opt") == "!"))
    if not links:
        raise GraphydbError("Empty chain")
    # optional-suffix semantics (beyond-reference): the first optional
    # link opens a LEFT-JOIN suffix — every link after it is structurally
    # optional too (a node reached only through an optional edge cannot
    # be mandatory), mirroring Cypher's OPTIONAL MATCH.
    if sum(1 for l in links if l.anti) > 1:
        raise GraphydbError("At most one anti ('!') link per chain")
    opt_at = next((i for i, l in enumerate(links) if l.optional), None)
    if opt_at is not None:
        if opt_at == 0:
            raise GraphydbError(
                "Chain cannot start with an optional link")
        if not links[opt_at].is_edge:
            raise GraphydbError(
                "Only edge links can be marked optional ('?' / '!'); "
                "nodes beyond one are absorbed automatically")
        if any(l.anti for l in links[:opt_at]):
            raise GraphydbError(
                "The anti ('!') link must open the suffix")
        for l in links[opt_at:]:
            l.optional = True
    ncollect = sum(1 for l in links if l.collect)
    if ncollect > 1:
        raise GraphydbError("Only one collect link ([...]) allowed per chain")
    if ncollect == 0:
        # default collect = right-most MANDATORY link: collecting an
        # optional link would return null-extended phantom rows
        last_mand = max(i for i, l in enumerate(links) if not l.optional)
        links[last_mand].collect = True
    collect = next(l for l in links if l.collect)
    if collect.optional:
        raise GraphydbError("The collect link cannot be optional")
    # structural sanity: no two adjacent links of the same class
    for a, b in zip(links, links[1:]):
        if a.is_edge == b.is_edge:
            raise GraphydbError(
                f"Chain must alternate nodes and edges: {a.alias!r}, {b.alias!r}")
    return links


# ---------------------------------------------------------------------------
# expression rewrites

_JSON_RE = re.compile(r"\b([A-Za-z_]\w*)\.data((?:\.[A-Za-z_]\w*)+)")
_GLOB_RE = re.compile(r"(\S+)\s+GLOB\s+('(?:[^']*)')", re.IGNORECASE)


def rewrite_json_paths(expr: str, typed: Optional[dict] = None) -> str:
    """``n.data.a.b`` → ``get_json_object(n.props, '$.a.b')``.

    Parity with ``jsonextract`` (graphydb.py:170-177); Spark's
    ``get_json_object`` uses the same ``$.path`` JSONPath dialect as
    SQLite's JSON1.

    ``typed`` maps alias → set of field names available in that frame's
    typed ``pstruct`` column.  Single-level paths into a typed field
    rewrite to ``alias.pstruct.field`` instead: Catalyst folds the struct
    access to the source column (columnar scan + pushed filter, no JSON
    parse), and values keep their native types — the same dynamic-typing
    behavior SQLite's ``json_extract`` has, which stringly
    ``get_json_object`` does not (SURVEY.md §7.4 trap #1).
    """
    def sub(m: re.Match) -> str:
        alias, path = m.group(1), m.group(2)
        key = path[1:]
        if typed and "." not in key and key in typed.get(alias, ()):
            return f"{alias}.pstruct.{key}"
        return f"get_json_object({alias}.props, '${path}')"
    return _JSON_RE.sub(sub, expr)


def glob_to_rlike(expr: str) -> str:
    """``x GLOB 'B*'`` → ``x RLIKE '^(?s:B.*)\\Z'`` (case-sensitive).

    SQLite GLOB (exercised in reference tests, tests/test_graphdb.py:64-67)
    is case-sensitive with ``*``/``?`` wildcards; ``fnmatch.translate``
    yields an equivalent Java-compatible regex which we anchor at the start
    (Spark RLIKE has find-anywhere semantics).
    """
    def sub(m: re.Match) -> str:
        target, pat = m.group(1), m.group(2)[1:-1]
        rx = "^" + fnmatch.translate(pat)
        rx = rx.replace("\\", "\\\\").replace("'", "\\'")
        return f"{target} RLIKE '{rx}'"
    return _GLOB_RE.sub(sub, expr)


_AGG_RE = re.compile(
    r"\b(COUNT|SUM|AVG|MIN|MAX|TOTAL|GROUP_CONCAT|COLLECT_LIST|COLLECT_SET"
    r"|FIRST|LAST|STDDEV|VARIANCE|ANY_VALUE)\s*\(", re.IGNORECASE)

_GROUP_CONCAT_RE = re.compile(r"\bGROUP_CONCAT\s*\(([^()]*)\)", re.IGNORECASE)
_TOTAL_RE = re.compile(r"\bTOTAL\s*\(([^()]*)\)", re.IGNORECASE)
_IFNULL_RE = re.compile(r"\bIFNULL\s*\(", re.IGNORECASE)


def rewrite_sqlite_funcs(expr: str) -> str:
    """Map SQLite-only functions onto Spark SQL equivalents.

    ``GROUP_CONCAT(x)`` → sorted ``array_join(collect_list)`` (SQLite's is
    insertion-ordered; we sort for determinism — documented divergence, see
    SURVEY.md §7.4). ``TOTAL(x)`` → null-safe double SUM. ``IFNULL`` →
    ``COALESCE``.
    """
    expr = _GROUP_CONCAT_RE.sub(
        r"array_join(sort_array(collect_list(\1)), ',')", expr)
    expr = _TOTAL_RE.sub(r"COALESCE(SUM(CAST(\1 AS DOUBLE)), 0.0D)", expr)
    expr = _IFNULL_RE.sub("COALESCE(", expr)
    return expr


def rewrite_expr(expr: str, typed: Optional[dict] = None) -> str:
    # sqlite-func rewrites first: their regexes assume un-expanded (flat)
    # argument lists, which the json-path expansion would break
    return rewrite_json_paths(glob_to_rlike(rewrite_sqlite_funcs(expr)),
                              typed=typed)


def is_aggregate_expr(expr: str) -> bool:
    return bool(_AGG_RE.search(expr))


def eliminable_links(links: list[Link], refs_text: str,
                     fts_aliases: set, integrity: dict,
                     allow_collect: bool = False) -> set:
    """Node links whose join is provably redundant.

    A node link can be dropped from the join tree when (a) nothing
    observes it — not collected, no extras, no FTS match, and its alias
    is never referenced in WHERE/ORDER/GROUP/extras — and (b) a
    neighboring edge link with a declared referential-integrity guarantee
    (``integrity[edge_kind] = (start_node_kind, end_node_kind)``) proves
    the node row exists with the required kind.  Because ``uid`` is the
    node table's key, the dropped join could never have changed row
    multiplicity; with the FK guarantee it cannot filter either, so
    elimination is semantics-preserving.  At scale this removes whole
    scans+joins of the (large) node table from multi-hop patterns — the
    reference's SQLite planner has no such rewrite (it never needs one at
    10k rows; at 100 TB it is the difference between k and 2k-1 joins).
    """
    out: set = set()
    for i, l in enumerate(links):
        if l.is_edge or l.extras or l.alias in fts_aliases or l.optional:
            continue
        if l.collect and not allow_collect:
            # the collect link is only droppable when the caller proved a
            # uid-only projection (fetch's PROJECT=['uid'] path) — its uid
            # then reads off the adjacent edge endpoint via collect_sub
            continue
        if re.search(rf"\b{re.escape(l.alias)}\s*\.", refs_text):
            continue
        roles = []
        if i > 0:
            el = links[i - 1]
            roles.append((el, "end" if el.ltype == "redge" else "start"))
        if i + 1 < len(links):
            er = links[i + 1]
            roles.append((er, "start" if er.ltype == "redge" else "end"))
        for edge, role in roles:
            if edge.optional:
                # an optional edge's FK guarantee holds only when the
                # edge matched; it cannot justify dropping a MANDATORY
                # node join (null-edge rows would lose the node's
                # existence filter)
                continue
            guar = integrity.get(edge.kind)
            if not guar:
                continue
            target = guar[0] if role == "start" else guar[1]
            if target is not None and (l.kind is None or l.kind == target):
                out.add(l.alias)
                break
    return out


# ---------------------------------------------------------------------------
# SQL emission

def compile_fetch_sql(
    links: list[Link],
    node_view: str,
    edge_view: str,
    where: Optional[object] = None,
    order: Optional[str] = None,
    group: Optional[str] = None,
    limit: Optional[int] = None,
    offset: Optional[int] = None,
    count: bool = False,
    distinct: bool = True,
    extras: Optional[dict] = None,
    fts_views: Optional[dict] = None,
    typed: Optional[dict] = None,
    eliminated: Optional[set] = None,
    edge_endpoints: Optional[dict] = None,
    edge_unique: Optional[dict] = None,
    project: Optional[list] = None,
    collect_sub: Optional[str] = None,
    kind_views: Optional[dict] = None,
) -> str:
    """Emit one Spark SQL SELECT for the parsed chain.

    Mirrors the reference's single-SELECT compilation (graphydb.py:874-973):
    one JOIN per adjacent link pair with kind predicates inlined, collect
    link projected, WHERE/GROUP/ORDER/LIMIT/OFFSET appended.  ``fts_views``
    maps alias → temp-view name holding matching uids; each becomes an IN
    subquery (semi-join), the Spark analogue of the reference's FTS MATCH
    join (graphydb.py:876-893).
    """
    extras = extras or {}
    fts_views = fts_views or {}
    eliminated = eliminated or set()
    kind_views = kind_views or {}
    collect = next(l for l in links if l.collect)

    def rel(l: Link) -> str:
        # a typed link with a declared per-kind branch frame compiles
        # against that single branch instead of the N-branch union —
        # same rows (the union is the disjoint concatenation of the
        # branches; the kind predicate below still applies), but the
        # analyzed plan Catalyst must re-optimize per action shrinks
        # ~10x (round 9, the plan-size fast path)
        view = kind_views.get(l.alias) or \
            (edge_view if l.is_edge else node_view)
        return f"{view} AS {l.alias}"

    # Each link exposes a left/right "connector" column; adjacent kept
    # links join connector-to-connector.  An eliminated node link
    # (redundant-join elimination — its existence is FK-guaranteed by a
    # neighboring edge and nothing references it) simply drops out of the
    # sequence, so the flanking edges join directly on their endpoint
    # columns and the node table never enters the plan.
    def conns(l: Link) -> tuple:
        if not l.is_edge:
            return f"{l.alias}.uid", f"{l.alias}.uid"
        if l.ltype == "redge":
            return f"{l.alias}.startuid", f"{l.alias}.enduid"
        return f"{l.alias}.enduid", f"{l.alias}.startuid"

    seq = [l for l in links if l.is_edge or l.alias not in eliminated]
    if not seq:
        raise GraphydbError("Chain eliminated every link")

    # Collect-link elimination (PROJECT=['uid'] + declared FK): the
    # terminal node table never enters the plan; its uid is read off the
    # adjacent edge endpoint given in ``collect_sub`` ("fn.startuid").
    collect_gone = collect.alias in eliminated
    if collect_gone:
        if not collect_sub:
            raise GraphydbError(
                "internal: collect link eliminated without a substitute")
        sub_alias, sub_col = collect_sub.split(".")
        sub_int = (f"{sub_alias}.skey" if sub_col == "startuid"
                   else f"{sub_alias}.ekey")

    # Int-key join rewrite.  uids are '<Kind>:<int>' and the frames carry
    # the raw int64 behind each uid/startuid/enduid (nkey / skey / ekey).
    # When BOTH connector kinds at a junction are statically known (node
    # link declares its kind; edge link's endpoint kinds come from the
    # graph's declared referential integrity) and equal, the string
    # equality  concat(K,':',a) = concat(K,':',b)  is exactly  a = b  —
    # so the join keys become int64s: cheaper hash/compare in the
    # HashedRelation build and probe, and no concat in the scan on the
    # join path.  Unknown or mismatched kinds keep the string join
    # (mismatched is correctly empty either way).
    def conn_kind(l: Link, side: int) -> Optional[str]:
        if not l.is_edge:
            return l.kind
        if edge_endpoints is None or not l.kind:
            return None
        skind, ekind = edge_endpoints.get(l.kind) or (None, None)
        fwd = l.ltype == "redge"
        return (skind if fwd else ekind) if side == 0 else \
               (ekind if fwd else skind)

    def conn_int(l: Link, side: int) -> str:
        if not l.is_edge:
            return f"{l.alias}.nkey"
        fwd = l.ltype == "redge"
        return (f"{l.alias}.skey" if fwd else f"{l.alias}.ekey") \
            if side == 0 else \
               (f"{l.alias}.ekey" if fwd else f"{l.alias}.skey")

    def junction_cond(a: Link, b: Link) -> str:
        ka, kb = conn_kind(a, 1), conn_kind(b, 0)
        if edge_endpoints is not None and ka and kb and ka == kb:
            return f"{conn_int(b, 0)} = {conn_int(a, 1)}"
        return f"{conns(b)[0]} = {conns(a)[1]}"

    # pair_cond[i] joins seq[i] to seq[i+1]
    pair_cond = [junction_cond(a, b) for a, b in zip(seq, seq[1:])]

    # Join-order heuristic: anchor the join tree at the most-constrained
    # link (single-alias WHERE predicates, FTS matches) and extend
    # outward along the chain, so the accumulated intermediate stays
    # small and Spark broadcasts IT instead of a large edge frame.  Inner
    # equi-join chains are order-independent semantically; without
    # derived-frame statistics Catalyst keeps the textual order, which
    # makes this the engine's (cheap, compile-time) join reordering.
    wlist = [where] if isinstance(where, str) else list(where or [])
    all_aliases = {l.alias for l in links}
    wrefs = [set(re.findall(r"\b(\w+)\s*\.", str(w))) & all_aliases
             for w in wlist]  # ∩ aliases: 'p.data.x' must not count 'data'
    # LEFT-JOIN suffix (optional links): starts at the first optional
    # link; the anchor must sit in the mandatory prefix (outer joins are
    # not freely reorderable) and the suffix is emitted last, in chain
    # order, with kind predicates inside ON (a WHERE kind filter would
    # silently turn the outer join inner).
    i0 = next((i for i, l in enumerate(seq) if l.optional), len(seq))
    scores = []
    for l in seq[:i0]:
        s = 0
        for refs in wrefs:
            if refs == {l.alias}:
                s += 2
        if l.alias in fts_views:
            s += 2
        scores.append(s)
    a = scores.index(max(scores))  # leftmost on ties → stable plans

    from_sql = rel(seq[a])
    conds0: list[str] = []
    if seq[a].kind:
        conds0.append(f"{seq[a].alias}.kind = '{seq[a].kind}'")
    join_sql = []
    order_idx = (list(range(a + 1, i0)) + list(range(a - 1, -1, -1))
                 + list(range(i0, len(seq))))
    for i in order_idx:
        l = seq[i]
        on = [pair_cond[i - 1] if i > a else pair_cond[i]]
        if l.kind:
            on.append(f"{l.alias}.kind = '{l.kind}'")
        jtype = "LEFT JOIN" if l.optional else "JOIN"
        join_sql.append(f"{jtype} {rel(l)} ON {' AND '.join(on)}")

    # SELECT list.  DISTINCT-by-row is the reference default (A3,
    # graphydb.py:865,903) but on a single-link chain uid is the table's
    # primary key, so rows are already unique — elide the dedup shuffle
    # (same rewrite SQLite's planner would not do; on Spark it saves a
    # full exchange+sort of the props column).
    # Key-preserving-join dedup elision.  The collect frame's rows are
    # unique by uid; each join outward from the collect link multiplies
    # cardinality only if the joined link can match a connector value
    # more than once.  Node links never fan out (uid is the primary
    # key).  An edge link fans out unless the edge kind is declared
    # unique on the connector column FACING the collect link (e.g. a
    # FK-shaped edge: one FromNation edge per customer).  If no link
    # fans out, the result is already distinct-by-row and the reference's
    # default DISTINCT (graphydb.py:865,903) is a no-op — eliding it
    # removes the dedup exchange, a full shuffle of the result at scale.
    def _conn_unique(l: Link, facing_right: bool) -> bool:
        if not l.is_edge:
            return True
        if not edge_unique or not l.kind:
            return False
        su, eu = edge_unique.get(l.kind, (False, False))
        # right connector of a redge is enduid; of a ledge is startuid
        if facing_right:
            return eu if l.ltype == "redge" else su
        return su if l.ltype == "redge" else eu

    if collect_gone:
        # Output rows are the substitute edge's endpoint values.  They
        # are unique iff (a) the joins away from the substitute edge
        # cannot fan its rows out (same key-preserving test as below)
        # AND (b) the edge kind is declared unique on the connector
        # facing the eliminated collect link (FK shape: one FromNation
        # edge per customer ⇒ distinct edges ⇒ distinct endpoints).
        # When both hold, the dedup GROUP BY is a no-op — the whole
        # chain becomes a shuffle-free broadcast-join map pipeline.
        sub_link = next(l for l in seq if l.alias == sub_alias)
        ci = seq.index(sub_link)
        collect_right = links.index(collect) > links.index(sub_link)
        no_fanout = (all(_conn_unique(l, True) for l in seq[:ci])
                     and all(_conn_unique(l, False) for l in seq[ci + 1:])
                     and _conn_unique(sub_link, collect_right))
        unique_anyway = no_fanout
    else:
        ci = seq.index(collect)
        no_fanout = (all(_conn_unique(l, True) for l in seq[:ci])
                     and all(_conn_unique(l, False) for l in seq[ci + 1:]))
        unique_anyway = len(links) == 1 or no_fanout
    # collect link eligible for the int-key identity rewrite: its uid is
    # '<Kind>:' || nkey, a bijection within the kind, so dedup/count can
    # key on the int64 instead of the concatenated string
    int_ident = (edge_endpoints is not None and not collect.is_edge
                 and collect.kind is not None)
    group_sql_override = None
    if count:
        if collect_gone:
            key = sub_int if int_ident else collect_sub
        else:
            key = f"{collect.alias}.nkey" if int_ident \
                else f"{collect.alias}.uid"
        agg = key if unique_anyway else f"DISTINCT {key}"
        select_sql = f"COUNT({agg}) AS n"
    elif collect_gone:
        # uid-only projection with the node join eliminated: uid is a
        # bijection of the edge's int endpoint within the (FK-known)
        # kind, so dedup keys on the int64 and uid is rebuilt per group
        uid_sql = (f"concat('{collect.kind}:', CAST({sub_int} AS STRING))"
                   if int_ident else collect_sub)
        if distinct and not unique_anyway and not group and not order:
            select_sql = f"{uid_sql} AS uid"
            group_sql_override = \
                f"GROUP BY {sub_int if int_ident else collect_sub}"
        else:
            select_sql = ("DISTINCT " if distinct and not unique_anyway
                          else "") + f"{uid_sql} AS uid"
    else:
        cols = EDGE_COLS if collect.is_edge else NODE_COLS
        if project:
            cols = [c for c in cols if c in project]
        parts = [f"{collect.alias}.{c} AS {c}" for c in cols]
        for name in collect.extras:
            if name not in extras:
                raise GraphydbError(
                    f"Extra column {name!r} declared in chain but no "
                    f"expression kwarg supplied")
        extras = {k: v for k, v in extras.items()
                  if not project or k in project}
        for name, e in extras.items():
            parts.append(f"({rewrite_expr(str(e), typed)}) AS {name}")
        select_sql = ("DISTINCT " if distinct and not unique_anyway else "") \
            + ", ".join(parts)
        # Dedup-by-uid rewrite: uid is the collect frame's primary key, so
        # when every extra depends only on the collect link, all selected
        # columns are functions of uid and row-DISTINCT ≡ GROUP BY uid with
        # a (deterministic) MIN representative.  The aggregate shuffles on
        # uid alone instead of the whole row (no props/JSON in the exchange
        # key), and a downstream projection that drops a column lets
        # Catalyst prune its MIN() — e.g. .count() never serializes props.
        # Extras referencing other aliases keep full-row DISTINCT: distinct
        # per-path values are genuinely separate result rows (reference
        # semantics, graphydb.py:865,903).
        if distinct and not unique_anyway and not group and not order:
            erefs = set()
            for e in extras.values():
                erefs |= set(re.findall(r"\b(\w+)\s*\.", str(e))) & \
                    {l.alias for l in links}
            if erefs <= {collect.alias}:
                if int_ident:
                    # group on the int64 key; uid is a function of it, so
                    # reconstruct it per GROUP (not per input row) and the
                    # dedup exchange hashes longs instead of strings
                    gkey = f"{collect.alias}.nkey"
                    reps = [f"concat('{collect.kind}:', "
                            f"CAST({gkey} AS STRING)) AS uid"]
                else:
                    gkey = f"{collect.alias}.uid"
                    reps = [f"{gkey} AS uid"]
                reps += [f"MIN({collect.alias}.{c}) AS {c}"
                         for c in cols if c != "uid"]
                reps += [f"MIN({rewrite_expr(str(e), typed)}) AS {name}"
                         for name, e in extras.items()]
                select_sql = ", ".join(reps)
                group_sql_override = f"GROUP BY {gkey}"

    # WHERE
    conds = list(conds0)
    by_alias = {l.alias: l for l in links}
    for alias, view in fts_views.items():
        if by_alias.get(alias) is not None and by_alias[alias].optional:
            raise GraphydbError(
                f"FTS match on optional link {alias!r}: the uid semi-join "
                f"would silently turn the LEFT JOIN inner — match a "
                f"mandatory link instead")
        conds.append(f"{alias}.uid IN (SELECT uid FROM {view})")
    if where:
        if isinstance(where, str):
            where = [where]
        # same footgun the FTS guard above exists for: a WHERE predicate
        # over an optional alias is evaluated AFTER the LEFT JOIN, where
        # the alias's columns are NULL for unmatched rows — the predicate
        # silently filters those rows out, turning the join inner.
        # Reference semantics put such predicates in the ON clause; we
        # don't rewrite user SQL, so reject with the fix spelled out.
        optional_aliases = {l.alias for l in links if l.optional}
        for w in where:
            refs = set(re.findall(r"\b(\w+)\s*\.", str(w)))
            bad = refs & optional_aliases
            if bad:
                raise GraphydbError(
                    f"WHERE predicate {w!r} references optional link(s) "
                    f"{sorted(bad)}: evaluated after the LEFT JOIN it "
                    f"silently drops unmatched rows (inner-join "
                    f"semantics). Filter the optional link in its chain "
                    f"segment, or make the link mandatory.")
        conds.extend(f"({rewrite_expr(w, typed)})" for w in where)
    # anti suffix: the whole LEFT-JOIN suffix must have found NO match —
    # a complete match binds the LAST suffix link, so its null-ness is
    # the no-complete-path test (Cypher's WHERE NOT exists(pattern)).
    # Partial suffix matches leave multiplicity artifacts that the
    # default DISTINCT collapses; without it the semantics leak.
    if any(l.anti for l in links):
        if not distinct:
            raise GraphydbError(
                "Anti ('!') chains require DISTINCT (partial suffix "
                "matches would duplicate surviving rows)")
        suffix_aliases = {l.alias for l in links if l.optional}
        for name, e in (extras or {}).items():
            if set(re.findall(r"\b(\w+)\s*\.", str(e))) & suffix_aliases:
                raise GraphydbError(
                    f"Extra {name!r} references the anti suffix — every "
                    f"surviving row has it NULL by construction")
        conds.append(f"{links[-1].alias}.uid IS NULL")
    where_sql = f"WHERE {' AND '.join(conds)}" if conds else ""

    # GROUP BY — SQLite lets bare columns ride along with aggregates and
    # returns an arbitrary representative row per group
    # (graphydb.py:953-956); Spark requires grouping or aggregating every
    # select expression.  We take MIN() as the (deterministic)
    # representative for the system columns and any non-aggregate extra
    # that is not itself a group key.
    group_sql = group_sql_override or ""
    if group and not count:
        keys = [k.strip() for k in _split_top_level(rewrite_expr(group, typed))]
        # int-key identity: grouping on the collect link's uid string is
        # grouping on its nkey (bijective within the kind) — swap the key
        # so the exchange hashes int64s, and rebuild uid per group
        uid_key = f"{collect.alias}.uid"
        uid_expr = uid_key
        if int_ident and uid_key in keys:
            keys[keys.index(uid_key)] = f"{collect.alias}.nkey"
            uid_expr = (f"concat('{collect.kind}:', "
                        f"CAST({collect.alias}.nkey AS STRING))")
        cols = EDGE_COLS if collect.is_edge else NODE_COLS
        if project:
            cols = [c for c in cols if c in project]
        parts = []
        for c in cols:
            q = f"{collect.alias}.{c}"
            if c == "uid" and uid_expr != uid_key:
                parts.append(f"{uid_expr} AS uid")
            else:
                parts.append(f"{q} AS {c}" if q in keys
                             else f"MIN({q}) AS {c}")
        for name, e in extras.items():
            rewritten = rewrite_expr(str(e), typed)
            if is_aggregate_expr(rewritten) or rewritten.strip() in keys:
                parts.append(f"({rewritten}) AS {name}")
            else:
                parts.append(f"MIN({rewritten}) AS {name}")
        # no DISTINCT on grouped output: every select list here carries
        # uid either as a group key or as MIN(uid), and group uid sets
        # are disjoint — rows are already unique, the dedup would be a
        # second full exchange for nothing
        select_sql = ", ".join(parts)
        group_sql = "GROUP BY " + ", ".join(keys)
    elif group:
        group_sql = "GROUP BY " + rewrite_expr(group, typed)

    order_sql = f"ORDER BY {rewrite_expr(order, typed)}" if order else ""
    limit_sql = f"LIMIT {int(limit)}" if limit is not None else ""
    offset_sql = f"OFFSET {int(offset)}" if offset is not None else ""

    parts = ["SELECT", select_sql, "FROM", from_sql, *join_sql,
             where_sql, group_sql, order_sql, limit_sql, offset_sql]
    sql = " ".join(p for p in parts if p)
    return _fuse_json_paths(sql, links, node_view, edge_view)


def _split_top_level(expr: str) -> list[str]:
    """Split on commas not nested inside parentheses."""
    out, depth, cur = [], 0, []
    for ch in expr:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


_GJO_RE = re.compile(r"get_json_object\((\w+)\.props, '\$\.(\w+)'\)")


def _fuse_json_paths(sql: str, links: list[Link], node_view: str,
                     edge_view: str) -> str:
    """One JSON parse per row instead of one per path reference.

    ``get_json_object`` re-parses the document on every call — the #1 hot
    path cost the compiler controls (SURVEY.md §4.3).  When a link alias
    references ≥2 distinct top-level keys, wrap its relation in a subquery
    that extracts all of them with a single ``json_tuple`` (one parse) and
    rewrite the references to the extracted columns.  Nested paths keep
    the direct ``get_json_object`` form.
    """
    by_alias: dict[str, list[str]] = {}
    for alias, key in _GJO_RE.findall(sql):
        keys = by_alias.setdefault(alias, [])
        if key not in keys:
            keys.append(key)
    links_by_alias = {l.alias: l for l in links}
    for alias, keys in by_alias.items():
        link = links_by_alias.get(alias)
        if link is None or len(keys) < 2:
            continue
        view = edge_view if link.is_edge else node_view
        old_rel = f"{view} AS {alias}"
        if old_rel not in sql:
            continue
        gj_cols = [f"__gj_{k}" for k in keys]
        key_list = ", ".join(f"'{k}'" for k in keys)
        new_rel = (f"(SELECT *, json_tuple(props, {key_list}) AS "
                   f"({', '.join(gj_cols)}) FROM {view}) AS {alias}")
        sql = sql.replace(old_rel, new_rel)
        for k in keys:
            sql = sql.replace(
                f"get_json_object({alias}.props, '$.{k}')",
                f"{alias}.__gj_{k}")
    return sql


# ---------------------------------------------------------------- varlength

_VARLEN_RE = re.compile(
    r"^(?P<alias>[A-Za-z_]\w*)"
    r"\*(?P<lo>\d+)?(?:\.\.(?P<hi>\d+))?"
    r"(?::(?P<kind>[A-Za-z_]\w*))?$")

#: expansion guard: a 1..n variable path compiles to n chains of up to n
#: joins each — unbounded depth belongs to the iterative operators
#: (k_hop / bfs_distance), not the declarative compiler
MAX_VARLEN_DEPTH = 8


def expand_varlength(chain: str) -> Optional[list[str]]:
    """Expand ONE variable-length edge ``-(e*lo..hi:Kind)>`` into the
    list of fixed-length chain strings (depth lo..hi) — Cypher's
    ``-[:K*1..3]->`` for the chain DSL, beyond the reference.

    Each depth-d expansion repeats the edge token d times with
    anonymous intermediate nodes (``e__2 … , e__v1 …``); the collect
    link, endpoints and every other alias survive verbatim, so the
    per-depth results are union-compatible.  Returns None when the
    chain has no variable-length token.  The var-length alias cannot
    collect, carry extras, or be referenced elsewhere (each depth
    binds different physical edges — there is no single 'e' row).
    """
    hits = []
    for i, token in enumerate(chain.split()):
        body = token
        if (token.startswith("-") and token.endswith(">")) or \
                (token.startswith("<") and token.endswith("-")):
            body = token[1:-1]
        if body.startswith("(") and body.endswith(")") and "*" in body:
            hits.append(i)
    if not hits:
        return None
    if len(hits) > 1:
        raise GraphydbError(
            "At most one variable-length link per chain")
    tokens = chain.split()
    i = hits[0]
    token = tokens[i]
    if token.startswith("-") and token.endswith(">"):
        arrow = ("-", ">")
    elif token.startswith("<") and token.endswith("-"):
        arrow = ("<", "-")
    else:
        raise GraphydbError(
            f"Variable-length marker only applies to edges: {token!r}")
    m = _VARLEN_RE.match(token[2:-2])
    if not m:
        raise GraphydbError(f"Malformed variable-length token: {token!r}")
    lo = int(m.group("lo") or 1)
    hi = int(m.group("hi") or lo)
    if not (1 <= lo <= hi):
        raise GraphydbError(
            f"Bad variable-length bounds *{lo}..{hi} (need 1 <= lo <= hi)")
    if hi > MAX_VARLEN_DEPTH:
        raise GraphydbError(
            f"Variable-length depth {hi} exceeds {MAX_VARLEN_DEPTH}; use "
            f"k_hop/bfs_distance for deep traversals")
    alias, kind = m.group("alias"), m.group("kind")
    ksuffix = f":{kind}" if kind else ""
    out = []
    for d in range(lo, hi + 1):
        parts = []
        for step in range(1, d + 1):
            ea = f"{alias}__{d}_{step}"
            parts.append(f"{arrow[0]}({ea}{ksuffix}){arrow[1]}")
            if step < d:
                parts.append(f"({alias}__v{d}_{step})")
        out.append(" ".join(tokens[:i] + parts + tokens[i + 1:]))
    return out


def uid_only_rewrites(links: list[Link], refs_parts: list[str],
                      fts_aliases: set, integrity: dict,
                      include_collect: bool = False) -> dict:
    """Node links observed ONLY through ``alias.uid`` → replacement
    expression over the adjacent edge's endpoint column.

    A node's uid is definitionally equal to the joining edge endpoint
    (``o.uid ≡ pl.enduid``), so when nothing else observes the node and
    a declared FK guarantees the row exists with the required kind, the
    uid reference can be read off the edge and the node join becomes
    fully eliminable (``eliminable_links`` then drops it).  E.g.
    ``GROUP c.uid, COUNT(o.uid)`` over ``[c] -(pl:Placed)> (o:Order)``
    compiles to customer ⋈ Placed alone — one whole node-table scan +
    join removed.
    """
    joined = " ".join(refs_parts)
    out: dict = {}
    for i, l in enumerate(links):
        if l.is_edge or l.extras or l.alias in fts_aliases or l.optional:
            continue
        if l.collect and not include_collect:
            continue
        occs = re.findall(rf"\b{re.escape(l.alias)}\s*\.\s*(\w+)", joined)
        if any(o != "uid" for o in occs):
            continue
        if not occs and not l.collect:
            # a non-collect node nobody references needs no rewrite —
            # eliminable_links alone handles it; the collect link needs
            # the replacement even when unreferenced (it IS the output)
            continue
        roles = []
        if i > 0:
            el = links[i - 1]
            roles.append((el, "end" if el.ltype == "redge" else "start"))
        if i + 1 < len(links):
            er = links[i + 1]
            roles.append((er, "start" if er.ltype == "redge" else "end"))
        for edge, role in roles:
            if edge.optional:
                continue
            guar = integrity.get(edge.kind)
            if not guar:
                continue
            target = guar[0] if role == "start" else guar[1]
            if target is not None and (l.kind is None or l.kind == target):
                col = "startuid" if role == "start" else "enduid"
                out[l.alias] = f"{edge.alias}.{col}"
                break
    return out
