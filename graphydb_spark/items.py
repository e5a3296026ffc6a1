"""Driver-side item model: uids, Node/Edge dict-items, diff/patch.

Re-expresses the reference's item layer (see /root/reference/graphydb.py:
``generateUUID`` :137-167, ``GraphyDBItem`` :1067-1283, ``Node`` :1295-1455,
``Edge`` :1458-1542, ``diff``/``patch`` :203-252, ``cleandata`` :196-201)
with a fresh implementation.  Items are small driver-side dicts; all bulk
work happens in Spark DataFrames (see :mod:`graphydb_spark.graph`).
"""

from __future__ import annotations

import copy as copy_mod
import random
import time
from collections.abc import MutableMapping
from typing import Any, Optional

#: keys that are mirrored into typed DataFrame columns and may not be used
#: as free-form property names in ways that conflict (reference
#: graphydb.py:130).
RESERVED = ("uid", "kind", "ctime", "mtime", "startuid", "enduid")

_BASE36 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_UID_LEN = 25


def generate_uid(rng: Optional[random.Random] = None) -> str:
    """25-char case-insensitive base-36 random uid (graphydb.py:137-167).

    36**25 ≈ 8.1e38 values; uniqueness is assumed jointly across nodes and
    edges (graphydb.py:1019-1044).
    """
    r = rng or random
    return "".join(r.choice(_BASE36) for _ in range(_UID_LEN))


def ensure_list(x) -> list:
    """Coerce None/scalar/list to a list (graphydb.py:179-187 parity —
    WHERE clauses and uid arguments accept a scalar or a list)."""
    if x is None:
        return []
    if isinstance(x, list):
        return x
    return [x]


def clean_data(data: dict) -> dict:
    """Strip transient keys (leading underscore) before persisting.

    Mirrors ``cleandata`` (graphydb.py:196-201): ``_``-prefixed keys carry
    query-computed extras and are never stored.
    """
    return {k: v for k, v in data.items() if not k.startswith("_")}


def diff_items(old: Optional[dict], new: Optional[dict]) -> dict:
    """JSON-dict diff for the change log (graphydb.py:203-236).

    Returns ``{'+': added_or_changed_new_values, '-': removed_or_changed_old
    values}`` with empty parts omitted.  A change touching only ``mtime`` is
    suppressed to an empty diff (graphydb.py:226-228).
    """
    old = old or {}
    new = new or {}
    plus = {k: v for k, v in new.items() if k not in old or old[k] != v}
    minus = {k: v for k, v in old.items() if k not in new or new[k] != v}
    if set(plus) | set(minus) <= {"mtime"}:
        return {}
    out: dict = {}
    if plus:
        out["+"] = plus
    if minus:
        out["-"] = minus
    return out


def patch_reverse(data: dict, change: dict) -> dict:
    """Apply the inverse of a change record to ``data`` (graphydb.py:238-252).

    Used by undo: re-instates ``'-'`` values and drops keys that were purely
    added in ``'+'``.
    """
    out = dict(data)
    plus = change.get("+", {})
    minus = change.get("-", {})
    for k in plus:
        if k not in minus:
            out.pop(k, None)
    for k, v in minus.items():
        out[k] = v
    return out


class Item(MutableMapping):
    """Dict-like node/edge view with uid/ctime/mtime defaults + dirty tracking.

    Parity with ``GraphyDBItem`` (graphydb.py:1067-1283): construction
    defaults ``uid``/``ctime``/``mtime`` (:1086-1091), any mutation touches
    ``mtime`` and records the key as dirty (:1199-1227), ``save`` is a no-op
    when clean (:1316-1317).
    """

    def __init__(self, graph=None, **data: Any) -> None:
        self.graph = graph
        now = time.time()
        self._data: dict = dict(data)
        self._data.setdefault("uid", generate_uid())
        self._data.setdefault("ctime", now)
        self._data.setdefault("mtime", now)
        # a fresh item is entirely dirty so first save persists everything
        self._dirty: set = set(self._data)

    # -- MutableMapping -----------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = value
        if key != "mtime":
            self._data["mtime"] = time.time()
            self._dirty.add("mtime")
        self._dirty.add(key)

    def __delitem__(self, key: str) -> None:
        del self._data[key]
        self._data["mtime"] = time.time()
        self._dirty.update((key, "mtime"))

    def __iter__(self):
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self._data!r})"

    # -- identity -----------------------------------------------------------
    @property
    def uid(self) -> str:
        return self._data["uid"]

    def __uid__(self) -> str:
        """Set-algebra identity (graphydb.py:1109-1110)."""
        return self._data["uid"]

    def __eq__(self, other: object) -> bool:
        if isinstance(other, Item):
            return self.uid == other.uid
        return NotImplemented

    def __hash__(self) -> int:
        return hash(self._data["uid"])

    # -- dirty tracking -----------------------------------------------------
    @property
    def changed(self) -> bool:
        return bool(self._dirty)

    def _mark_clean(self) -> None:
        self._dirty = set()

    def set(self, **attr: Any) -> "Item":
        """Bulk attribute set (graphydb.py:1199-1206)."""
        for k, v in attr.items():
            self[k] = v
        return self

    def data(self) -> dict:
        """Persistable snapshot (transient ``_`` keys stripped)."""
        return clean_data(self._data)

    def copy(self, newuid: bool = False) -> "Item":
        """Shallow duplicate (graphydb.py:1260-1271).

        Matches the reference default: ``copy()`` keeps the SAME uid (a
        handle onto the same stored item) and carries the dirty-key set
        across; ``copy(newuid=True)`` mints a fresh identity."""
        d = dict(self._data)
        if newuid:
            d["uid"] = generate_uid()
        out = type(self)(graph=self.graph, **d)
        if not newuid:
            out._dirty = set(self._dirty)
        return out

    def deepcopy(self, newuid: bool = False) -> "Item":
        """Deep duplicate — nested values are copied too
        (graphydb.py:1273-1283)."""
        d = copy_mod.deepcopy(self._data)
        if newuid:
            d["uid"] = generate_uid()
        out = type(self)(graph=self.graph, **d)
        if not newuid:
            out._dirty = set(self._dirty)
        return out

    def discard(self, key: str) -> "Item":
        """Remove ``key`` if present (graphydb.py:1229-1235)."""
        if key in self._data:
            del self[key]
        return self

    def setGraph(self, graph, changed: bool = True) -> "Item":
        """Attach the item to a graph (graphydb.py:1100-1107)."""
        self.graph = graph
        self.setChanged(changed)
        return self

    def setChanged(self, changed: bool) -> None:
        """Mark every key dirty (True) or the item clean (False)
        (graphydb.py:1112-1121)."""
        if changed:
            self._dirty = set(self._data)
        else:
            self._dirty = set()

    def updatefts(self, **data) -> "Item":
        """Reference-API shim (graphydb.py:1165-1197).  Our FTS index is
        DERIVED from the node/edge tables at match time (fts.py), so
        there is no side table to patch — the index can never desync and
        this is a deliberate no-op that keeps ported code running."""
        return self

    def deletefts(self) -> "Item":
        """Reference-API shim (graphydb.py:1237-1244) — see updatefts."""
        return self

    @classmethod
    def fromkeys(cls, iterable, value=None) -> "Item":
        """dict.fromkeys parity (graphydb.py:1285-1291; the reference's
        version references ``self`` inside a classmethod and would
        NameError — here every key lands dirty on the new item, which is
        what its intent reads as).  Subclass construction requirements
        (Node's kind, Edge's endpoints) are deliberately bypassed: the
        result is a key template, validated at save time like any other
        mutation."""
        out = cls.__new__(cls)
        Item.__init__(out)
        for key in iterable:
            out[key] = value
        return out

    # -- store refresh ------------------------------------------------------
    @property
    def exists(self) -> bool:
        """True iff this uid is in the store (graphydb.py:1129-1139)."""
        return self.graph.exists(self._data["uid"])

    def original(self) -> "Item":
        """Return the item fresh from the store (graphydb.py:1141-1146).

        The returned item reflects persisted state only: unsaved local
        edits and transient ``_`` keys are absent.  Raises
        ``GraphydbError`` if the uid was never saved."""
        return self.graph.getuid(self._data["uid"])

    def renew(self) -> "Item":
        """Reload from the store in place (graphydb.py:1148-1163).

        Local changes are discarded without recording a change item;
        transient ``_``-prefixed keys are carried over undisturbed."""
        fresh = self.original()
        data = dict(fresh._data)
        for k, v in self._data.items():
            if k.startswith("_"):
                data[k] = v
        self._data = data
        self._mark_clean()
        return self


class Node(Item):
    """A node item (graphydb.py:1295-1455). Requires ``kind``."""

    def __init__(self, graph=None, **data: Any) -> None:
        if not data.get("kind"):
            raise GraphydbError("Node requires a kind")
        super().__init__(graph=graph, **data)

    # Traversals delegate to the graph's fetch (see graph.py).
    def outE(self, CHAIN=None, **kw):
        return self.graph.fetch(CHAIN or "-[e]>", _anchor=("e.startuid", self.uid), **kw)

    def inE(self, CHAIN=None, **kw):
        return self.graph.fetch(CHAIN or "<[e]-", _anchor=("e.enduid", self.uid), **kw)

    def outN(self, CHAIN=None, **kw):
        return self.graph.fetch(CHAIN or "-(e)> [n]", _anchor=("e.startuid", self.uid), **kw)

    def inN(self, CHAIN=None, **kw):
        return self.graph.fetch(CHAIN or "<(e)- [n]", _anchor=("e.enduid", self.uid), **kw)

    def bothE(self, **kw):
        """Union of in/out edges, deduped by uid (graphydb.py:1359-1378).

        COUNT must count the union, not the sum of the two directions.
        """
        count = kw.pop("COUNT", False)
        out = self.outE(**kw) | self.inE(**kw)
        return len(out) if count else out

    def bothN(self, **kw):
        count = kw.pop("COUNT", False)
        out = self.outN(**kw) | self.inN(**kw)
        return len(out) if count else out

    def save(self, force: bool = False, batch: Optional[str] = None,
             setchange: bool = True) -> "Node":
        self.graph.save_node(self, force=force, batch=batch, setchange=setchange)
        return self

    def delete(self, disconnect: bool = False, batch: Optional[str] = None,
               setchange: bool = True) -> None:
        self.graph.delete_node(self, disconnect=disconnect, batch=batch,
                               setchange=setchange)


class Edge(Item):
    """A directed edge item (graphydb.py:1458-1542).

    ``startuid``/``enduid`` reference node uids; self-loops and parallel
    edges are legal (graphydb.py:96-97).
    """

    def __init__(self, graph=None, **data: Any) -> None:
        if not data.get("kind"):
            raise GraphydbError("Edge requires a kind")
        if not data.get("startuid") or not data.get("enduid"):
            raise GraphydbError("Edge requires startuid and enduid")
        super().__init__(graph=graph, **data)

    @property
    def start(self) -> Optional[Node]:
        """Dereference the start node (graphydb.py:1527-1539)."""
        return self.graph.getuid(self["startuid"])

    @property
    def end(self) -> Optional[Node]:
        return self.graph.getuid(self["enduid"])

    def save(self, force: bool = False, batch: Optional[str] = None,
             setchange: bool = True) -> "Edge":
        self.graph.save_edge(self, force=force, batch=batch, setchange=setchange)
        return self

    def delete(self, batch: Optional[str] = None, setchange: bool = True) -> None:
        self.graph.delete_edge(self, batch=batch, setchange=setchange)


class GraphydbError(Exception):
    """Engine error (parity with ``GraphyDBException``)."""
