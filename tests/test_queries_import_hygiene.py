"""Import hygiene of the ordered queries package (VERDICT r7 #6).

Round 7 split the 19.5k-line queries module into ordered parts and
backfilled every part's namespace with every other part's names — which
preserved byte-stability but meant a typo'd global in one part could
silently resolve to another part's helper.  Round 8 removed the
backfill: each part owns its namespace (earlier parts arrive via the
ordered star-import chain; the two genuine forward references are
function-local imports).  This lint walks every function a part
defines, collects its actual LOAD_GLOBAL names from bytecode
(recursively through nested code objects — lambdas, comprehensions,
inner defs), and asserts each resolves in the part's own namespace or
builtins.  A typo is now a red test, not a silent cross-part binding.
"""
import builtins
import dis
import importlib
import types

import pytest

PARTS = ["_shared", "_graph_core", "_relational", "_pipeline",
         "_analytics_a", "_analytics_b", "_analytics_c", "_analytics_d",
         "_oracle_table", "_retrieval_ann", "_registry"]

_BUILTINS = frozenset(dir(builtins))


def _global_loads(co: types.CodeType) -> set:
    names = {ins.argval for ins in dis.get_instructions(co)
             if ins.opname in ("LOAD_GLOBAL", "LOAD_NAME")}
    for c in co.co_consts:
        if isinstance(c, types.CodeType):
            names |= _global_loads(c)
    return names


@pytest.mark.parametrize("part", PARTS)
def test_part_globals_resolve_without_backfill(part):
    mod = importlib.import_module(f"graphydb_spark.queries.{part}")
    ns = vars(mod)
    unresolved = {}
    for k, v in ns.items():
        if isinstance(v, types.FunctionType) and v.__module__ == mod.__name__:
            missing = {n for n in _global_loads(v.__code__)
                       if n not in ns and n not in _BUILTINS}
            if missing:
                unresolved[k] = sorted(missing)
    assert not unresolved, (
        f"{part}: function globals that resolve in no namespace "
        f"(typo or missing import): {unresolved}")


def test_package_has_no_backfill():
    """The cross-setattr backfill stays deleted: no part module carries
    an attribute it neither defined nor imported (spot-check: _shared
    must NOT see _registry's QUERIES, the signature backfill symptom)."""
    shared = importlib.import_module("graphydb_spark.queries._shared")
    assert not hasattr(shared, "QUERIES")
    assert not hasattr(shared, "q_ivf_batch_probe")
