"""float32 cast boundary for the Pallas kernel entry points.

Mosaic (the Pallas TPU compiler) has no 64-bit lowering: any f64 operand
or weak-typed intermediate that promotes to f64 inside a kernel raises
``NotImplementedError: 64-bit types are not supported`` at lowering time
(measured round 3: enabling ``jax_enable_x64`` globally made
``jax.random`` draws inside ``gp.draw_fn_sample`` come out float64, which
then crashed ``ops.pathwise._pathwise_kernel`` at the ``xo + phase``
add). The kernels are f32 programs by design (forced-HIGHEST f32 MXU
accumulation), so the correct behaviour under x64 mode is to compute in
f32 and cast the result back to the caller's dtype - exactly what this
boundary does. The casts are ordinary ``convert_element_type`` ops, so
reverse-mode cotangents flow through them unchanged.
"""

import jax.numpy as jnp


def f32_args(args):
    """Cast any float64 array in ``args`` to float32.

    Returns (cast_args, had_f64). Non-arrays (Python scalars, static ints)
    and non-f64 arrays pass through untouched.
    """
    had = False
    out = []
    for a in args:
        if getattr(a, 'dtype', None) == jnp.float64:
            out.append(a.astype(jnp.float32))
            had = True
        else:
            out.append(a)
    return tuple(out), had
