"""Exact-arithmetic scheduling simulator.

Capability parity with `/root/reference/sAP/util/schedule_sim.py:19-70`:
simulate the cumulative temporal mismatch of streaming scheduling policies
(idle-free, idle-next, shrinking-tail, half-tail, half-next-tail) with
``Fraction`` rationals so the comparison is exact, not float-noisy. This is
the analytical companion to the dynamic-schedule flag in the online loop.

Usage: ``python -m streamyolo_tpu.stream.schedule_sim`` prints the policy
table for the default (r=1.5 frame-times, T=13, eta=0) setup.
"""

from __future__ import annotations

import math
from fractions import Fraction
from typing import Callable, Dict, Union

Number = Union[int, float, Fraction]


def sim(policy: Callable[[Number, Number], bool], r: Number, T: int, eta: int = 0) -> Number:
    """Cumulative temporal mismatch of ``policy`` for runtime ``r`` (in frame
    periods) over ``T`` frames. ``policy(t_finish, r) -> wait?`` decides
    whether to idle until the next frame boundary before starting work."""
    assert eta >= -1, "not implemented for eta < -1"
    cmismatch: Number = 0
    result_idx = None
    process_idx = 0
    t_finish = r  # always start with no idle time
    for t in range(T - eta):
        if t_finish < t:
            result_idx = process_idx
            if policy(t_finish, r):
                t_finish = t + r
                process_idx = t
            else:
                # result_idx == t-1 means r <= 1: already waiting on fresh data
                process_idx = t if t_finish == t or result_idx == t - 1 else t - 1
                t_finish += r
        if t + eta >= 0 and result_idx is not None:
            cmismatch += t + eta - result_idx
    return cmismatch


def tail(x: Number) -> Number:
    return x - math.floor(x)


def p_idle_free(t_finish, r) -> bool:
    return False


def p_idle_next(t_finish, r) -> bool:
    return True


def p_shrinking_tail(t_finish, r) -> bool:
    return tail(t_finish) > tail(t_finish + r)


def p_half_tail(t_finish, r) -> bool:
    return tail(t_finish) >= Fraction(1, 2)


def p_half_next_tail(t_finish, r) -> bool:
    return tail(t_finish + r) < Fraction(1, 2)


POLICIES: Dict[str, Callable] = {
    "idle_free": p_idle_free,
    "idle_next": p_idle_next,
    "shrinking_tail": p_shrinking_tail,
    "half_tail": p_half_tail,
    "half_next_tail": p_half_next_tail,
}


def main(r: Number = 1 + Fraction(1, 2), T: int = 13, eta: int = 0):
    for name, policy in POLICIES.items():
        cmismatch = sim(policy, r, T, eta)
        print(f"{name}: {cmismatch}, {float(cmismatch) / T:.6g}")


if __name__ == "__main__":
    main()
