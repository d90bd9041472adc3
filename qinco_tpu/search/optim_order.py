"""Exploration ordering for the operating-point sweep.

The reference ships a table of 209 empirically Pareto-optimal settings
and explores grid points nearest (in log2 space) to that prior first
(reference: qinco/search/optim_order.py, search_tasks.py:285-303).  That
table is experiment data we can't reproduce offline, so the prior here is
*generated*: a ladder of balanced pipeline settings following the scaling
relationships measured over the reference's table (201 rows):
``log2(nprobe/nshort)`` has median 0 with p10/p90 at ∓1, ``efSearch``
sits at a median 4·nprobe (p10 1x, p90 16x), and the mid-rerank
expansion stays small (1-6x, mode 1).  The distance-ordering machinery
is equivalent.
"""

from __future__ import annotations

import math


def generated_pareto_prior() -> list[dict]:
    prior = []
    for log_ns in range(0, 12):  # nshort 1 .. 2048
        nshort = 2**log_ns
        for probe_ratio in (0.5, 1.0, 2.0):
            nprobe = max(1, int(nshort * probe_ratio))
            for nmid in (1, 2, 4, 6):
                prior.append(
                    {
                        "nshort": nshort,
                        "nprobe": nprobe,
                        "quantizer_efSearch": max(4, 4 * nprobe),
                        "nmid_short": nmid,
                    }
                )
    return prior


PARETO_PRIOR = generated_pareto_prior()


def _log_distance(a: dict, b: dict) -> float:
    return sum(
        abs(
            math.log2(max(1, b[key])) - math.log2(max(1, a.get(key, 1)))
        )
        for key in b
    )


def sort_experiments_by_prior(op, keys: list[tuple]) -> list[tuple]:
    """Order grid keys by distance to the nearest prior point
    (reference: sort_experiments_pareto_front, search_tasks.py:285-303)."""
    scored = []
    for i, key in enumerate(keys):
        params = op.get_parameters(key)
        min_dist = min(_log_distance(p, params) for p in PARETO_PRIOR)
        scored.append((min_dist, i, key))
    scored.sort()
    return [s[-1] for s in scored]
