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
    periods) over ``T`` frames. ``policy(done_at, r) -> wait?`` decides
    whether to idle until the next frame boundary before starting work.

    Modeled as a one-server queue ticked at frame boundaries: the detector
    always has exactly one job in flight, described by ``(done_at, src)`` —
    when it finishes and its input frame. Each query at time ``now + eta``
    is answered by the freshest finished job, and the mismatch it pays is
    the age of that job's input frame.
    """
    if eta < -1:
        raise NotImplementedError(
            "queries more than one frame ahead of observations"
        )
    total_age: Number = 0
    freshest = None  # input frame index of the newest finished job
    job = (r, 0)  # the first job grabs frame 0 the instant it appears
    for now in range(T - eta):
        done_at, src = job
        if done_at < now:  # the in-flight job finished before this tick
            freshest = src
            if policy(done_at, r):
                # idle to the boundary and take the brand-new frame
                job = (now + r, now)
            else:
                # start immediately on the newest captured frame. That is
                # frame now-1 (mid-period start), except when the job ended
                # exactly on the boundary, or when the pipeline is already
                # frame-synchronous (r <= 1 makes the previous input now-1),
                # in which case frame `now` is what the camera just emitted.
                synchronous = done_at == now or freshest == now - 1
                job = (done_at + r, now if synchronous else now - 1)
        if now + eta >= 0 and freshest is not None:
            total_age += now + eta - freshest
    return total_age


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
