"""Collective-traffic accounting for SPMD programs.

Walks the jaxpr of a sharded computation and tallies every collective:
ppermute (halo strips), all_gather (coarse-grid gathers), psum/pmin/pmax
(reductions) -- with per-device payload bytes from the operand avals.
`lax.scan` bodies are multiplied by their trip count; `while_loop` bodies
are counted once per iteration and flagged dynamic.

This is the scaling-efficiency methodology of BASELINE.md's north star:
comm volume and exchange counts are exact properties of the compiled
program, reportable on the virtual CPU mesh, and combined with ICI
bandwidth give the comm-time bound that real multi-chip hardware would
confirm.  See bench_scaling.py for the reporting harness.
"""

import jax

__all__ = ["collective_stats"]

_COLLECTIVES = ("ppermute", "all_gather", "psum", "pmin", "pmax",
                "all_to_all", "reduce_scatter")


def _aval_bytes(aval):
    try:
        return aval.size * aval.dtype.itemsize
    except Exception:
        return 0


def _walk(jaxpr, stats, mult, in_while):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        base = name.split("_invariant")[0]
        matched = None
        for c in _COLLECTIVES:
            if base == c or name == c:
                matched = c
                break
        if matched is not None:
            ent = stats.setdefault(matched, {"count": 0, "bytes": 0})
            ent["count"] += mult
            ent["bytes"] += mult * sum(_aval_bytes(v.aval)
                                       for v in eqn.invars
                                       if hasattr(v, "aval"))
            if in_while:
                stats["_dynamic_trip"] = True
        # recurse into sub-jaxprs (ClosedJaxpr params carry .jaxpr; the
        # shard_map/while/cond params hold plain Jaxprs with .eqns)
        for pname, p in eqn.params.items():
            sub = []
            for cand in (p if isinstance(p, (list, tuple)) else (p,)):
                if hasattr(cand, "eqns"):
                    sub.append(cand)
                elif hasattr(cand, "jaxpr"):
                    sub.append(cand.jaxpr)
            for sj in sub:
                m = mult
                w = in_while
                if name == "scan" and pname == "jaxpr":
                    m = mult * int(eqn.params.get("length", 1))
                if name == "while":
                    w = True
                _walk(sj, stats, m, w)


def collective_stats(fn, *args):
    """Trace fn(*args) and tally its collectives.

    Returns {"ppermute": {"count": n, "bytes": b}, ..., "total_bytes": B,
    "dynamic_trip": bool} -- bytes are per-device payloads; while_loop
    bodies count one iteration and set dynamic_trip.
    """
    closed = jax.make_jaxpr(fn)(*args)
    stats = {}
    _walk(closed.jaxpr, stats, 1, False)
    dynamic = bool(stats.pop("_dynamic_trip", False))
    stats["total_bytes"] = sum(v["bytes"] for v in stats.values()
                               if isinstance(v, dict))
    stats["dynamic_trip"] = dynamic
    return stats
