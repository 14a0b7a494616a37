"""Pallas TPU kernel: tiled Gram-matrix assembly for radial kernels.

Gram assembly is the setup-time hot op at large N (the N x N kernel matrices
behind the spatial prior Cholesky and global collocation,
``/root/reference/src/pnmol/kernels.py:38-45`` builds them with nested vmaps).
This kernel computes one (128, 128) output tile per grid cell:

    d2 = |x|^2 + |y|^2 - 2 x.y        (the inner product rides the MXU)
    K  = phi(d2)                      (fused elementwise on the VPU, in VMEM)

so no N x N intermediate (distance matrix) ever exists in HBM — the only HBM
traffic is the two point blocks in and the Gram tile out.

CPU/debug fallback: ``interpret=True`` runs the same kernel through the
Pallas interpreter; :func:`gram_radial` dispatches automatically.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import; absent on CPU-only builds of jaxlib
    from jax.experimental.pallas import tpu as pltpu

    _MEMORY_SPACE = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEMORY_SPACE = None

TILE = 128


def _phi_squared_exponential(d2, input_scale, output_scale):
    return output_scale**2 * jnp.exp(-d2 * input_scale**2 / 2.0)


def _phi_matern52(d2, input_scale, output_scale):
    scaled = jnp.sqrt(5.0 * jnp.maximum(d2, 0.0) * input_scale**2)
    poly = 1.0 + scaled + scaled**2 / 3.0
    return output_scale**2 * poly * jnp.exp(-scaled)


_PHI = {
    "squared_exponential": _phi_squared_exponential,
    "matern52": _phi_matern52,
}


def _gram_tile_kernel(x_ref, y_ref, out_ref, *, phi, input_scale, output_scale):
    x = x_ref[:]  # (TILE, dim)
    y = y_ref[:]  # (TILE, dim)
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)  # (TILE, 1)
    y_sq = jnp.sum(y * y, axis=1, keepdims=True).T  # (1, TILE)
    xy = jax.lax.dot_general(
        x,
        y,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
    )  # (TILE, TILE) on the MXU
    d2 = jnp.maximum(x_sq + y_sq - 2.0 * xy, 0.0)
    out_ref[:] = phi(d2, input_scale, output_scale)


def _pad_points(points, tile):
    n = points.shape[0]
    n_pad = (-n) % tile
    if n_pad:
        # pad with a far-away sentinel so padded rows do not alias real points
        sentinel = jnp.full((n_pad, points.shape[1]), 1e30, dtype=points.dtype)
        points = jnp.concatenate((points, sentinel), axis=0)
    return points, n


@functools.partial(
    jax.jit, static_argnames=("input_scale", "output_scale", "phi_name", "interpret")
)
def gram_radial(points_x, points_y, input_scale, output_scale, *, phi_name,
                interpret=False):
    """Dense Gram K[i, j] = phi(|x_i - y_j|) via the tiled Pallas kernel.

    points_x (N, dim), points_y (M, dim) -> (N, M). The scales are static
    (Python floats baked into the kernel — one compile per hyperparameter).
    """
    phi = _PHI[phi_name]
    points_x = jnp.asarray(points_x)
    points_y = jnp.asarray(points_y)
    # Center the cloud first: |x|^2+|y|^2-2x.y loses ~half the significant
    # digits for nearby points far from the origin; distances are translation
    # invariant, so subtracting a shared center is exact and removes the
    # cancellation (must happen BEFORE padding — the 1e30 sentinel would
    # poison the mean).
    center = jnp.mean(points_x, axis=0, keepdims=True)
    x_padded, n = _pad_points(points_x - center, TILE)
    y_padded, m = _pad_points(points_y - center, TILE)
    dim = x_padded.shape[1]
    grid = (x_padded.shape[0] // TILE, y_padded.shape[0] // TILE)

    kernel = functools.partial(
        _gram_tile_kernel,
        phi=phi,
        input_scale=float(input_scale),
        output_scale=float(output_scale),
    )
    kwargs = {}
    if _MEMORY_SPACE is not None:
        block_x = pl.BlockSpec((TILE, dim), lambda i, j: (i, 0), memory_space=_MEMORY_SPACE)
        block_y = pl.BlockSpec((TILE, dim), lambda i, j: (j, 0), memory_space=_MEMORY_SPACE)
        block_o = pl.BlockSpec((TILE, TILE), lambda i, j: (i, j), memory_space=_MEMORY_SPACE)
    else:
        block_x = pl.BlockSpec((TILE, dim), lambda i, j: (i, 0))
        block_y = pl.BlockSpec((TILE, dim), lambda i, j: (j, 0))
        block_o = pl.BlockSpec((TILE, TILE), lambda i, j: (i, j))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (x_padded.shape[0], y_padded.shape[0]), x_padded.dtype
        ),
        grid=grid,
        in_specs=[block_x, block_y],
        out_specs=block_o,
        interpret=interpret,
    )(x_padded, y_padded)
    return out[:n, :m]


def gram_fast_jnp(points_x, points_y, input_scale, output_scale, *, phi_name):
    """Vectorized jnp fallback with the same distance-trick math (XLA fuses
    this into a matmul + elementwise epilogue; used on CPU / small N)."""
    phi = _PHI[phi_name]
    x = jnp.asarray(points_x)
    y = jnp.asarray(points_y)
    center = jnp.mean(x, axis=0, keepdims=True)  # see gram_radial: exact, kills
    x = x - center  # the cancellation for clouds far from the origin
    y = y - center
    d2 = (
        jnp.sum(x * x, axis=1)[:, None]
        + jnp.sum(y * y, axis=1)[None, :]
        - 2.0 * x @ y.T
    )
    return phi(jnp.maximum(d2, 0.0), input_scale, output_scale)
