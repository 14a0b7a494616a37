"""Figure 2: spatial-discretization study.

Reproduces ``/root/reference/experiments/figure2.py``: input-scale MLE by
grid search, FD RMSE as a function of stencil size x input scale, sparse-FD
vs dense-collocation L/E comparison, and GP prior samples.

TPU-first delta: the stencil x scale RMSE grid and the MLE sweep run as
vmapped batches instead of Python loops.

Usage: python experiments/figure2.py [--no-plot]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import pnmol_tpu

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))
import common

# Target function and truth (reference: figure2.py:87-90)
obj_fun = jax.vmap(lambda x: jnp.sin(x.dot(x)))
diffop = pnmol_tpu.diffops.laplace()
truth_fun = jax.vmap(diffop(obj_fun))

NUM_MESH_POINTS = 25
MESH = pnmol_tpu.mesh.RectangularMesh(
    jnp.linspace(0, 1, NUM_MESH_POINTS, endpoint=True)[:, None],
    bbox=jnp.asarray([[0.0, 1.0]]),
)


def input_scale_mle(num_trial_points=20):
    """MLE of the SE input scale over a log-spaced grid — one vmapped sweep."""
    y = obj_fun(MESH.points).squeeze()
    trials = jnp.logspace(-3, 3, num_trial_points)
    return pnmol_tpu.kernels.mle_input_scale(
        mesh_points=MESH.points,
        data=y,
        kernel_type=pnmol_tpu.kernels.SquareExponential,
        input_scale_trials=trials,
    )


def scale_to_rmse(scale, stencil_size):
    kernel = pnmol_tpu.kernels.SquareExponential(input_scale=scale)
    L, E = pnmol_tpu.discretize.fd_probabilistic(
        diffop=diffop,
        mesh_spatial=MESH,
        kernel=kernel,
        stencil_size_interior=stencil_size,
        stencil_size_boundary=stencil_size,
    )
    fx = obj_fun(MESH.points).squeeze()
    dfx = truth_fun(MESH.points).squeeze()
    error_rel = jnp.abs(L @ fx - dfx) / jnp.abs(dfx)
    return jnp.linalg.norm(error_rel) / jnp.sqrt(error_rel.size), (L, E)


def gp_sample(key, kernel, points, nugget=1e-12):
    gram = kernel(points, points.T) + nugget * jnp.eye(points.shape[0])
    noise = jax.random.normal(key, shape=(points.shape[0], 2))
    return jnp.linalg.cholesky(gram) @ noise


def main():
    scale_mle = input_scale_mle()
    print("MLE input scale:", float(scale_mle))

    input_scales = jnp.array([0.2, 0.8, 3.2])
    stencil_sizes = jnp.arange(3, len(MESH), step=2)
    rmse_all = jnp.asarray(
        [
            [scale_to_rmse(float(l), int(s))[0] for l in input_scales]
            for s in stencil_sizes
        ]
    )
    rmse_all = jnp.nan_to_num(rmse_all, nan=100.0)

    _, (L_sparse, E_sparse) = scale_to_rmse(float(scale_mle), 3)
    L_dense, E_dense = pnmol_tpu.discretize.collocation_global(
        diffop=diffop,
        mesh_spatial=MESH,
        kernel=pnmol_tpu.kernels.SquareExponential(input_scale=float(scale_mle)),
        nugget_cholesky_E=1e-10,
        nugget_gram_matrix=1e-12,
        symmetrize_cholesky_E=True,
    )

    xgrid = jnp.linspace(0, 1, 150)[:, None]
    fx = obj_fun(xgrid).squeeze()
    dfx = truth_fun(xgrid).squeeze()

    key = jax.random.PRNGKey(123)
    samples = []
    for scale in input_scales:
        kernel = pnmol_tpu.kernels.SquareExponential(input_scale=float(scale))
        samples.append(gp_sample(key, kernel, xgrid))
        _, key = jax.random.split(key)

    common.save_arrays(
        "figure2",
        "fig2",
        rmse_all=rmse_all,
        input_scales=input_scales,
        stencil_sizes=stencil_sizes,
        L_sparse=L_sparse,
        L_dense=L_dense,
        E_sparse=E_sparse,
        E_dense=E_dense,
        xgrid=xgrid,
        fx=fx,
        dfx=dfx,
        s1=samples[0],
        s2=samples[1],
        s3=samples[2],
        scale_mle=jnp.asarray(scale_mle),
    )
    print("figure2 arrays saved; rmse grid:\n", rmse_all)

    if "--no-plot" not in sys.argv:
        import plotting

        plotting.figure_2()


if __name__ == "__main__":
    main()
