"""Iteration-cap sufficiency guards for fixed-point loops.

Every iterative operator in this engine (connected components, k-core
peeling, BFS relaxation) runs a bounded synchronized loop with a 1-row
convergence checksum per round and an early break at the fixpoint. The
cap exists so a pathological input cannot loop forever — but before this
module, a cap hit WITHOUT convergence was silent: the loop simply emitted
whatever the last round produced. On adversarial inputs (a chain graph
deeper than the cap) that is an under-iterated, semantically wrong result.

``guard_converged`` makes the cap explicit policy instead of a silent
truncation:

- ``strict=True`` (connected components): the registered oracle is a TRUE
  transitive closure to fixpoint, so an un-converged Spark result would
  genuinely differ from the declared semantics — raise
  ``IterationCapExceeded`` rather than emit it.
- ``strict=False`` (k-core, BFS): the oracle unrolls the SAME truncated
  round count, so the result still matches the declared "within N rounds"
  semantics — emit a ``RuntimeWarning`` flagging that the true fixpoint
  may lie beyond the cap, and return the truncated result.

The guard is driver-side and free: it reads the converged flag the loops
already maintain from their existing 1-row checksums — no extra Spark job.
"""

from __future__ import annotations

import warnings

__all__ = ["IterationCapExceeded", "guard_converged"]


class IterationCapExceeded(RuntimeError):
    """An iterative operator hit its round cap before its convergence
    checksum stabilized; the result would be under-iterated."""


def guard_converged(
    converged: bool, op: str, rounds: int, *, strict: bool = True
) -> None:
    """Assert (strict) or warn (non-strict) that a fixed-point loop's cap
    was sufficient. ``converged`` is the loop's own checksum-stability
    flag; ``rounds`` the cap that was exhausted when it is False."""
    if converged:
        return
    msg = (
        f"{op}: iteration cap ({rounds} rounds) exhausted before the "
        "convergence checksum stabilized — input needs a deeper loop "
        "(e.g. a component/graph of diameter > cap). Raise the cap or "
        "switch to the O(log n) two-phase variant where available."
    )
    if strict:
        raise IterationCapExceeded(msg)
    warnings.warn(msg, RuntimeWarning, stacklevel=3)
