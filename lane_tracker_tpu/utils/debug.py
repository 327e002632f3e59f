"""Numeric-safety debug modes.

The reference is single-threaded with plain attribute mutation, so its only
"race detection" is construction (SURVEY §5).  Here the functional design
removes shared mutable state by construction; what remains worth guarding
is numeric health (NaN/Inf escaping the guarded degenerate-fit paths) and
accidental nondeterminism.  ``debug_mode()`` enables jax's NaN debugging and
disables fastmath-style rematerialization differences for a scope.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def debug_mode(nan_checks: bool = True):
    """Scope with jax debug_nans/debug_infs enabled.

    Under this mode any NaN/Inf produced by a jitted tracker step raises
    immediately with the offending primitive, instead of silently flowing
    into detection flags.
    """
    import jax

    prev_nan = jax.config.jax_debug_nans
    prev_inf = jax.config.jax_debug_infs
    try:
        if nan_checks:
            jax.config.update("jax_debug_nans", True)
            jax.config.update("jax_debug_infs", True)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
        jax.config.update("jax_debug_infs", prev_inf)


def assert_states_equal(a, b, atol=0.0):
    """Determinism check: two tracker states must be identical.

    Useful for verifying that replaying a stream (or resuming from a
    snapshot) reproduces the exact same trajectory.
    """
    import numpy as np

    for name, la, lb in zip(a._fields, a, b):
        la, lb = np.asarray(la), np.asarray(lb)
        if atol == 0.0:
            if not np.array_equal(la, lb):
                raise AssertionError(f"state field {name} differs")
        else:
            np.testing.assert_allclose(la, lb, atol=atol, err_msg=name)
