"""Complex-safe jit boundaries for the axon TPU backend.

The tunneled TPU backend cannot move complex64 across the host<->device
boundary — not as transfers, not as jit arguments or results. Complex math
works fine INSIDE a compiled function, so the convention is:

  * every jit entry point takes/returns only real arrays
  * complex pytree leaves (carried DSP state: FIR histories, channelizer
    tails, PLL windows) are stored as float32 (..., 2) stacks and converted
    with lax.complex / stacking INSIDE the jit (fuses to nothing)

`pack_tree` / `unpack_tree` convert a pytree; `complex_safe` wraps a
step(x, state) -> (outputs, state) function into one whose state (and any
complex outputs) are packed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pack_array", "unpack_array", "pack_tree", "unpack_tree",
           "complex_safe"]

_MARKER_AXIS_NAME = "__iq__"


def pack_array(a):
    if jnp.iscomplexobj(a):
        return jnp.stack([a.real.astype(jnp.float32),
                          a.imag.astype(jnp.float32)], axis=-1)
    return a


def unpack_array(a, was_complex: bool):
    if was_complex:
        return jax.lax.complex(a[..., 0], a[..., 1]).astype(jnp.complex64)
    return a


def complex_flags(tree):
    """Pytree of bools marking complex leaves (from an unpacked tree)."""
    return jax.tree.map(lambda a: bool(jnp.iscomplexobj(a)), tree)


def pack_tree(tree):
    return jax.tree.map(pack_array, tree)


def unpack_tree(tree, flags):
    return jax.tree.map(unpack_array, tree, flags)


def complex_safe(step_fn, example_state):
    """Wrap step(x, state)->(outputs, state) so state crosses jit
    boundaries as float pairs. Returns (wrapped_fn, packed_init_state).

    `example_state` provides the complex-leaf layout; outputs are packed
    too (real outputs pass through unchanged).
    """
    flags = complex_flags(example_state)

    def wrapped(x, packed_state):
        state = unpack_tree(packed_state, flags)
        outputs, new_state = step_fn(x, state)
        return jax.tree.map(pack_array, outputs), pack_tree(new_state)

    return wrapped, pack_tree(example_state)
