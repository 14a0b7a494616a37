"""Example PDE problem recipes: heat, SIR, Lotka-Volterra, spruce budworm.

Capability parity with ``/root/reference/src/pnmol/pde/examples.py`` — the
same four model families, each in raw and ``_discretized`` form, with the
same default hyperparameters so that figure1-4 reproductions use identical
problems.
"""

import functools

import jax
import jax.numpy as jnp

from pnmol_tpu import diffops, kernels, mesh
from pnmol_tpu.models import problems

# ---------------------------------------------------------------------------
# Default initial conditions (Dirichlet-compatible bells)
# ---------------------------------------------------------------------------


def gaussian_bell_1d_centered(x, bbox, width=1.0):
    midpoint = 0.5 * (bbox[1] + bbox[0])
    return jnp.exp(-((x - midpoint) ** 2) / width**2)


def gaussian_bell_1d(x):
    return jnp.exp(-(x**2))


def sin_bell_1d(x):
    return 0.1 * jnp.sin(jnp.pi * x)


# ---------------------------------------------------------------------------
# Heat equation (linear)
# ---------------------------------------------------------------------------


def heat_1d(
    *, bbox=None, t0=0.0, tmax=5.0, y0_fun=None, diffusion_rate=0.05, bcond="dirichlet"
):
    """1-D heat equation u_t = diffusion_rate * Laplace(u)."""
    if bbox is None:
        bbox = [0.0, 1.0]
    bbox = jnp.asarray(bbox)

    if y0_fun is None:
        bell = functools.partial(gaussian_bell_1d_centered, bbox=bbox)
        y0_fun = lambda x: bell(x) * sin_bell_1d(x)

    cls = {
        "dirichlet": problems.LinearEvolutionDirichlet,
        "neumann": problems.LinearEvolutionNeumann,
    }.get(bcond)
    if cls is None:
        raise ValueError(f"Unknown boundary condition: {bcond!r}")
    return cls(
        diffop=diffops.laplace(),
        diffop_scale=diffusion_rate,
        bbox=bbox,
        t0=t0,
        tmax=tmax,
        y0_fun=y0_fun,
    )


def heat_1d_discretized(
    *,
    bbox=None,
    dx=0.05,
    stencil_size_interior=3,
    stencil_size_boundary=3,
    t0=0.0,
    tmax=5.0,
    y0_fun=None,
    diffusion_rate=0.05,
    nugget_gram_matrix_fd=0.0,
    kernel=None,
    bcond="dirichlet",
):
    heat = heat_1d(
        bbox=bbox,
        t0=t0,
        tmax=tmax,
        y0_fun=y0_fun,
        diffusion_rate=diffusion_rate,
        bcond=bcond,
    )
    heat.discretize(
        mesh_spatial=mesh.RectangularMesh.from_bbox_1d(heat.bbox, step=dx),
        kernel=kernel if kernel is not None else kernels.SquareExponential(),
        stencil_size_interior=stencil_size_interior,
        stencil_size_boundary=stencil_size_boundary,
        nugget_gram_matrix=nugget_gram_matrix_fd,
    )
    return heat


def heat_2d(
    *, bbox=None, t0=0.0, tmax=5.0, y0_fun=None, diffusion_rate=0.05,
    bcond="dirichlet",
):
    """2-D heat equation with Dirichlet or Neumann boundaries.

    Beyond the reference's model zoo (its recipes are all 1-D): the scale
    configuration of BASELINE.md ("2-D diffusion N=1e4") needs a 2-D problem;
    the generic discretization path (bbox classification + k-NN stencils)
    already supports it, and Neumann boundaries use the n-D directional
    kernel FD (``discretize.fd_probabilistic_neumann``).
    """
    if bbox is None:
        bbox = [[0.0, 1.0], [0.0, 1.0]]
    bbox = jnp.asarray(bbox)

    if y0_fun is None:

        def y0_fun(x):
            bump = jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
            return bump[..., None]

    cls = {
        "dirichlet": problems.LinearEvolutionDirichlet,
        "neumann": problems.LinearEvolutionNeumann,
    }.get(bcond)
    if cls is None:
        raise ValueError(f"Unknown boundary condition: {bcond!r}")
    return cls(
        diffop=diffops.laplace(),
        diffop_scale=diffusion_rate,
        bbox=bbox,
        t0=t0,
        tmax=tmax,
        y0_fun=y0_fun,
    )


def heat_2d_discretized(
    *,
    bbox=None,
    num_points=(12, 12),
    stencil_size_interior=9,
    stencil_size_boundary=5,
    t0=0.0,
    tmax=5.0,
    y0_fun=None,
    diffusion_rate=0.05,
    nugget_gram_matrix_fd=1e-12,
    kernel=None,
    bcond="dirichlet",
):
    heat = heat_2d(
        bbox=bbox, t0=t0, tmax=tmax, y0_fun=y0_fun,
        diffusion_rate=diffusion_rate, bcond=bcond
    )
    heat.discretize(
        mesh_spatial=mesh.RectangularMesh.from_bbox_2d(heat.bbox, nums=num_points),
        kernel=kernel if kernel is not None else kernels.SquareExponential(),
        stencil_size_interior=stencil_size_interior,
        stencil_size_boundary=stencil_size_boundary,
        nugget_gram_matrix=nugget_gram_matrix_fd,
    )
    return heat


def advection_diffusion(
    *,
    dim=2,
    bbox=None,
    t0=0.0,
    tmax=1.0,
    y0_fun=None,
    diffusion_rate=0.05,
    velocity=None,
):
    """Linear advection-diffusion ``u_t = kappa lap(u) - v . grad(u)``.

    Beyond the reference's (all-1-D, diffusion-only) model zoo: this is the
    BASELINE.md scale family ("3-D advection-diffusion N=1e5"), built from
    the same diffop algebra (``scalar_mult(kappa) o laplace - v . grad``)
    and the generic n-D discretization path. Dirichlet boundaries.
    """
    if bbox is None:
        bbox = [[0.0, 1.0]] * dim
    bbox = jnp.asarray(bbox)
    if velocity is None:
        velocity = [1.0] * dim

    if y0_fun is None:

        def y0_fun(x):
            bump = jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
            return bump[..., None]

    diffop = diffops.scalar_mult(diffusion_rate).compose_with(
        diffops.laplace()
    ) - diffops.directional_derivative(velocity)
    return problems.LinearEvolutionDirichlet(
        diffop=diffop,
        diffop_scale=1.0,
        bbox=bbox,
        t0=t0,
        tmax=tmax,
        y0_fun=y0_fun,
    )


def advection_diffusion_discretized(
    *,
    dim=2,
    bbox=None,
    num_points=None,
    stencil_size_interior=None,
    stencil_size_boundary=None,
    t0=0.0,
    tmax=1.0,
    y0_fun=None,
    diffusion_rate=0.05,
    velocity=None,
    nugget_gram_matrix_fd=1e-12,
    kernel=None,
):
    """Discretized advection-diffusion in ``dim`` spatial dimensions.

    Stencil defaults follow the tensor-grid neighbor structure: 3^dim-ish
    interior stencils capture the full mixed-derivative neighborhood.
    """
    if num_points is None:
        num_points = (12,) * dim
    if stencil_size_interior is None:
        stencil_size_interior = {1: 3, 2: 9, 3: 11}.get(dim, 2 * dim + 1)
    if stencil_size_boundary is None:
        stencil_size_boundary = {1: 3, 2: 5, 3: 7}.get(dim, dim + 2)
    pde = advection_diffusion(
        dim=dim,
        bbox=bbox,
        t0=t0,
        tmax=tmax,
        y0_fun=y0_fun,
        diffusion_rate=diffusion_rate,
        velocity=velocity,
    )
    pde.discretize(
        mesh_spatial=mesh.RectangularMesh.from_bbox_nd(pde.bbox, nums=num_points),
        kernel=kernel if kernel is not None else kernels.SquareExponential(),
        stencil_size_interior=stencil_size_interior,
        stencil_size_boundary=stencil_size_boundary,
        nugget_gram_matrix=nugget_gram_matrix_fd,
    )
    return pde


def fisher_kpp_2d(
    *,
    bbox=None,
    t0=0.0,
    tmax=5.0,
    y0_fun=None,
    diffusion_rate=0.05,
    growth_rate=1.0,
    bcond="dirichlet",
):
    """2-D Fisher-KPP reaction-diffusion (logistic growth + diffusion).

    Beyond the reference's model zoo (its semilinear recipes are all 1-D,
    ``/root/reference/src/pnmol/pde/examples.py``): the pointwise logistic
    nonlinearity of :func:`spruce_budworm_1d` composed with the n-D
    discretization path that :func:`heat_2d` exercises — a 2-D traveling
    front whose PDE-filter solve runs through the semilinear EK1 solvers.
    """
    if bbox is None:
        bbox = [[0.0, 1.0], [0.0, 1.0]]
    bbox = jnp.asarray(bbox)

    if y0_fun is None:

        def y0_fun(x):
            bump = jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
            return 0.5 * bump[..., None]

    @jax.jit
    def f(_, x):
        return growth_rate * x * (1.0 - x)

    df = jax.jit(jax.jacfwd(f, argnums=1))

    cls = {
        "dirichlet": problems.SemiLinearEvolutionDirichlet,
        "neumann": problems.SemiLinearEvolutionNeumann,
    }.get(bcond)
    if cls is None:
        raise ValueError(f"Unknown boundary condition: {bcond!r}")
    return cls(
        t0=t0,
        tmax=tmax,
        y0_fun=y0_fun,
        bbox=bbox,
        diffop=diffops.laplace(),
        diffop_scale=diffusion_rate,
        f=f,
        df=df,
        df_diagonal=None,
    )


def fisher_kpp_2d_discretized(
    *,
    bbox=None,
    num_points=(12, 12),
    stencil_size_interior=9,
    stencil_size_boundary=5,
    t0=0.0,
    tmax=5.0,
    y0_fun=None,
    diffusion_rate=0.05,
    growth_rate=1.0,
    nugget_gram_matrix_fd=1e-12,
    kernel=None,
    bcond="dirichlet",
):
    pde = fisher_kpp_2d(
        bbox=bbox,
        t0=t0,
        tmax=tmax,
        y0_fun=y0_fun,
        diffusion_rate=diffusion_rate,
        growth_rate=growth_rate,
        bcond=bcond,
    )
    pde.discretize(
        mesh_spatial=mesh.RectangularMesh.from_bbox_2d(pde.bbox, nums=num_points),
        kernel=kernel if kernel is not None else kernels.SquareExponential(),
        stencil_size_interior=stencil_size_interior,
        stencil_size_boundary=stencil_size_boundary,
        nugget_gram_matrix=nugget_gram_matrix_fd,
    )
    return pde


# ---------------------------------------------------------------------------
# SIR reaction-diffusion system (3 species, semilinear)
# ---------------------------------------------------------------------------


def sir_1d(
    *,
    bbox=None,
    t0=0.0,
    tmax=50.0,
    diffusion_rate_S=0.1,
    diffusion_rate_I=0.1,
    diffusion_rate_R=0.1,
    beta=0.3,
    gamma=0.07,
    N=1000.0,
):
    """Spatial SIR model: diffusing susceptible/infectious/recovered."""
    if bbox is None:
        bbox = [0.0, 1.0]
    bbox = jnp.asarray(bbox)

    def y0_fun(x):
        infectious0 = 200.0 * gaussian_bell_1d_centered(x, bbox, width=0.5) + 1.0
        s0 = N * jnp.ones_like(infectious0) - infectious0
        return jnp.concatenate((s0, infectious0, jnp.zeros_like(infectious0)))

    @jax.jit
    def f(t, x):
        s, i, r = jnp.split(x, 3)
        total = s + i + r
        infections = beta * s * i / total
        recoveries = gamma * i
        return jnp.concatenate((-infections, infections - recoveries, recoveries))

    df = jax.jit(jax.jacfwd(f, argnums=1))

    lap = diffops.laplace()
    return problems.SystemSemiLinearEvolutionNeumann(
        diffop=(lap, lap, lap),
        diffop_scale=(diffusion_rate_S, diffusion_rate_I, diffusion_rate_R),
        bbox=bbox,
        t0=t0,
        tmax=tmax,
        y0_fun=y0_fun,
        f=f,
        df=df,
        df_diagonal=None,
    )


def sir_1d_discretized(
    *,
    bbox=None,
    dx=0.05,
    t0=0.0,
    tmax=50.0,
    beta=0.3,
    gamma=0.07,
    N=1000.0,
    diffusion_rate_S=0.1,
    diffusion_rate_I=0.1,
    diffusion_rate_R=0.1,
    kernel=None,
    nugget_gram_matrix_fd=0.0,
    stencil_size_interior=3,
    stencil_size_boundary=3,
):
    sir = sir_1d(
        bbox=bbox,
        t0=t0,
        tmax=tmax,
        diffusion_rate_S=diffusion_rate_S,
        diffusion_rate_I=diffusion_rate_I,
        diffusion_rate_R=diffusion_rate_R,
        beta=beta,
        gamma=gamma,
        N=N,
    )
    sir.discretize_system(
        mesh_spatial=mesh.RectangularMesh.from_bbox_1d(sir.bbox, step=dx),
        kernel=kernel if kernel is not None else kernels.SquareExponential(),
        stencil_size_interior=stencil_size_interior,
        stencil_size_boundary=stencil_size_boundary,
        nugget_gram_matrix=nugget_gram_matrix_fd,
    )
    return sir


# ---------------------------------------------------------------------------
# Lotka-Volterra reaction-diffusion system (2 species, semilinear)
# ---------------------------------------------------------------------------


def lotka_volterra_1d(
    *,
    bbox=None,
    t0=0.0,
    tmax=10.0,
    a=0.5,
    b=0.05,
    c=0.05,
    d=0.5,
    diffusion_scale_u=0.1,
    diffusion_scale_v=0.1,
):
    """Spatial predator-prey dynamics with diffusion."""
    if bbox is None:
        bbox = [0.0, 1.0]
    bbox = jnp.asarray(bbox)

    def y0_fun(x):
        prey0 = 5.0 * jnp.ones_like(x)
        predator0 = 20.0 * gaussian_bell_1d(x)
        return jnp.concatenate((prey0, predator0))

    @jax.jit
    def f(_, x):
        u, v = jnp.split(x, 2)
        return jnp.concatenate((a * u - b * u * v, c * u * v - d * v))

    df = jax.jit(jax.jacfwd(f, argnums=1))

    lap = diffops.laplace()
    return problems.SystemSemiLinearEvolutionNeumann(
        diffop=(lap, lap),
        diffop_scale=(diffusion_scale_u, diffusion_scale_v),
        bbox=bbox,
        t0=t0,
        tmax=tmax,
        y0_fun=y0_fun,
        f=f,
        df=df,
        df_diagonal=None,
    )


def lotka_volterra_1d_discretized(
    *,
    dx=0.05,
    kernel=None,
    nugget_gram_matrix_fd=0.0,
    stencil_size_interior=3,
    stencil_size_boundary=3,
    **kwargs,
):
    pde = lotka_volterra_1d(**kwargs)
    pde.discretize_system(
        mesh_spatial=mesh.RectangularMesh.from_bbox_1d(pde.bbox, step=dx),
        kernel=kernel if kernel is not None else kernels.SquareExponential(),
        stencil_size_interior=stencil_size_interior,
        stencil_size_boundary=stencil_size_boundary,
        nugget_gram_matrix=nugget_gram_matrix_fd,
    )
    return pde


# ---------------------------------------------------------------------------
# Spruce budworm / Fisher-KPP (scalar, semilinear)
# ---------------------------------------------------------------------------


def spruce_budworm_1d(
    *,
    bbox=None,
    t0=0.0,
    tmax=10.0,
    diffusion_rate=0.1,
    y0_fun=None,
    bcond="dirichlet",
    growth_rate=1.0,
):
    """Fisher-KPP logistic reaction-diffusion equation."""
    if bbox is None:
        bbox = [0.0, 1.0]
    bbox = jnp.asarray(bbox)

    if y0_fun is None:
        y0_fun = sin_bell_1d

    @jax.jit
    def f(_, x):
        return growth_rate * x * (1.0 - x)

    df = jax.jit(jax.jacfwd(f, argnums=1))

    cls = {
        "dirichlet": problems.SemiLinearEvolutionDirichlet,
        "neumann": problems.SemiLinearEvolutionNeumann,
    }.get(bcond)
    if cls is None:
        raise ValueError(f"Unknown boundary condition: {bcond!r}")
    return cls(
        t0=t0,
        tmax=tmax,
        y0_fun=y0_fun,
        bbox=bbox,
        diffop=diffops.laplace(),
        diffop_scale=diffusion_rate,
        f=f,
        df=df,
        df_diagonal=None,
    )


def spruce_budworm_1d_discretized(
    *,
    bbox=None,
    t0=0.0,
    tmax=10.0,
    diffusion_rate=1.0,
    y0_fun=None,
    dx=0.1,
    kernel=None,
    nugget_gram_matrix_fd=0.0,
    stencil_size_interior=3,
    stencil_size_boundary=3,
    bcond="dirichlet",
    growth_rate=1.0,
):
    spruce = spruce_budworm_1d(
        bbox=bbox,
        t0=t0,
        tmax=tmax,
        diffusion_rate=diffusion_rate,
        y0_fun=y0_fun,
        bcond=bcond,
        growth_rate=growth_rate,
    )
    spruce.discretize(
        mesh_spatial=mesh.RectangularMesh.from_bbox_1d(spruce.bbox, step=dx),
        kernel=kernel if kernel is not None else kernels.SquareExponential(),
        stencil_size_interior=stencil_size_interior,
        stencil_size_boundary=stencil_size_boundary,
        nugget_gram_matrix=nugget_gram_matrix_fd,
    )
    return spruce
