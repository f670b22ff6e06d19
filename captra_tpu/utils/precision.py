"""Matmul-precision control.

TPU matmuls default to bfloat16 inputs on the MXU; that is right for the
network (large convs) but wrong for 3x3 pose algebra, Procrustes and metric
computations where 1e-3 errors become degrees of rotation error.  Decorate
pose-math entry points with `@f32_precision` so every `@`/`einsum` inside
runs with float32 MXU passes, without touching global config.
"""
import functools

import jax


def f32_precision(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapped
