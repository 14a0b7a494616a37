"""Structured (Kronecker-factored) initialization vs the dense QR oracle.

Round 1 initialized the solvers through a dense ``kron(chol_gram, s I_n)``
plus two full-size ``update_sqrt`` QRs (mirroring the reference,
``/root/reference/src/pnmol/white.py:24-56``), which capped single-chip scale
at N=2048. The structured path computes the y0 update in closed form and the
PDE update in product form; these tests pin its exactness (identical mean and
covariance — the factor itself may differ by a right orthogonal transform).
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg
import pytest

from pnmol_tpu import kernels, latent, white
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step
from pnmol_tpu.ops import iwp, sqrt

PRIOR = kernels.Matern52() + kernels.WhiteNoise()


@pytest.fixture(scope="module")
def heat():
    return examples.heat_1d_discretized(dx=0.2, tmax=1.0)


@pytest.fixture(scope="module")
def spruce():
    return examples.spruce_budworm_1d_discretized(dx=0.2, tmax=1.0)


def _dense_y0_oracle(gram, chol_gram, y0, s, nugget, n):
    """The round-1 / reference init: dense kron prior + one update_sqrt QR."""
    d = gram.shape[0]
    prior = iwp.IntegratedWienerTransition(
        num_derivatives=n - 1, wiener_process_dimension=d,
        wp_diffusion_sqrtm=chol_gram,
    )
    E0 = prior.projection_matrix(0)
    C_raw = jnp.kron(chol_gram, s * jnp.eye(n))
    C_post, gain, _ = sqrt.update_sqrt(E0, C_raw, nugget * jnp.eye(d))
    return gain @ y0, C_post


@pytest.mark.parametrize("n", [2, 3])
def test_structured_y0_update_matches_dense_oracle(heat, n):
    X = heat.mesh_spatial.points
    gram = PRIOR(X, X.T)
    chol_gram = jnp.linalg.cholesky(gram)
    s, nugget = 1.0, 1e-10

    u0, blocks = white.structured_init_y0(gram, chol_gram, heat.y0, s, nugget, n)
    C_struct = white.point_major_blockdiag(blocks)
    m_oracle, C_oracle = _dense_y0_oracle(gram, chol_gram, heat.y0, s, nugget, n)

    d = gram.shape[0]
    m_struct = iwp.mean_to_flat(jnp.zeros((n, d)).at[0].set(u0))
    assert jnp.allclose(m_struct, m_oracle, rtol=1e-9, atol=1e-12)
    assert jnp.allclose(
        C_struct @ C_struct.T, C_oracle @ C_oracle.T, rtol=1e-8, atol=1e-12
    )


def _dense_white_initialize_oracle(solver_cls, pde, nu):
    """Replicates the round-1 dense initialize() end-to-end."""
    n, d = nu + 1, pde.L.shape[0]
    X = pde.mesh_spatial.points
    gram = PRIOR(X, X.T)
    chol_gram = jnp.linalg.cholesky(gram)
    prior = iwp.IntegratedWienerTransition(
        num_derivatives=nu, wiener_process_dimension=d, wp_diffusion_sqrtm=chol_gram
    )
    E0, E1 = prior.projection_matrix(0), prior.projection_matrix(1)
    nugget = 1e-10
    C_raw = jnp.kron(chol_gram, jnp.eye(n))
    C_y0, gain_y0, _ = sqrt.update_sqrt(E0, C_raw, nugget * jnp.eye(d))
    m0_flat = gain_y0 @ pde.y0

    linear = solver_cls is white.LinearWhiteNoiseEK1
    z, H, E_bc = white._evaluate_ode_dense(
        L=pde.L, B=pde.B, E_sqrtm=pde.E_sqrtm, R_sqrtm=pde.R_sqrtm,
        f=getattr(pde, "f", None), df=getattr(pde, "df", None),
        linear=linear, E0=E0, E1=E1, m_flat=m0_flat, t=pde.t0,
    )
    nugget_pde = nugget * jnp.eye(d + pde.B.shape[0])
    C0, gain, _ = sqrt.update_sqrt(H, C_y0, E_bc + nugget_pde)
    return m0_flat - gain @ z, C0


@pytest.mark.parametrize(
    "solver_cls,problem",
    [(white.LinearWhiteNoiseEK1, "heat"), (white.SemiLinearWhiteNoiseEK1, "spruce")],
)
def test_white_initialize_matches_dense_oracle(solver_cls, problem, heat, spruce):
    pde = heat if problem == "heat" else spruce
    nu = 2
    solver = solver_cls(
        steprule=step.Constant(0.1), num_derivatives=nu, spatial_kernel=PRIOR
    )
    state = solver.initialize(pde)
    m_oracle, C_oracle = _dense_white_initialize_oracle(solver_cls, pde, nu)

    n = nu + 1
    assert jnp.allclose(
        iwp.mean_to_flat(state.y.mean), m_oracle, rtol=1e-8, atol=1e-11
    )
    assert jnp.allclose(
        state.y.cov_sqrtm @ state.y.cov_sqrtm.T,
        C_oracle @ C_oracle.T,
        rtol=1e-7,
        atol=1e-11,
    )


def test_latent_initialize_matches_dense_oracle(heat):
    """Latent: structured stacked init vs the round-1 dense block_diag path."""
    nu = 2
    n, d = nu + 1, heat.L.shape[0]
    solver = latent.LinearLatentForceEK1(
        steprule=step.Constant(0.1), num_derivatives=nu, spatial_kernel=PRIOR
    )
    state = solver.initialize(heat)

    # dense oracle (round-1 code path)
    X = heat.mesh_spatial.points
    gram = PRIOR(X, X.T)
    chol_gram = jnp.linalg.cholesky(gram)
    nugget = 1e-6
    c0 = jnp.eye(n)
    C_state_raw = jnp.kron(chol_gram, c0)
    C_latent_raw = jnp.kron(heat.E_sqrtm, c0)
    E0 = solver.E0
    C_state_y0, gain_y0, _ = sqrt.update_sqrt(E0, C_state_raw, nugget * jnp.eye(d))
    m0_state = gain_y0 @ heat.y0
    m0_stack = jnp.concatenate((m0_state, jnp.zeros_like(m0_state)))
    C_block = jax.scipy.linalg.block_diag(C_state_y0, C_latent_raw)
    z, H = solver._evaluate_ode_dense(heat, m0_stack, heat.t0)
    C0, gain, _ = sqrt.update_sqrt(H, C_block, nugget * jnp.eye(d + heat.B.shape[0]))
    m_oracle = m0_stack - gain @ z

    m_state, m_latent = jnp.split(m_oracle, 2)
    mean_oracle = jnp.concatenate(
        (iwp.flat_to_mean(m_state, n), iwp.flat_to_mean(m_latent, n)), axis=1
    )
    assert jnp.allclose(state.y.mean, mean_oracle, rtol=1e-8, atol=1e-11)
    assert jnp.allclose(
        state.y.cov_sqrtm @ state.y.cov_sqrtm.T,
        C0 @ C0.T,
        rtol=1e-7,
        atol=1e-11,
    )
