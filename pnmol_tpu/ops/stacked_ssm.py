"""Block-diagonal stacking of several IWP processes into one state space.

Capability parity with ``/root/reference/src/pnmol/base/stacked_ssm.py``.

TPU-first observation: when all stacked processes share the same number of
derivatives (the only case the latent-force solver uses — state-IWP plus
latent-force-IWP, ``/root/reference/src/pnmol/latent.py:136-153``), the
stacked system is *itself* an IWP over the concatenated point set:

    blockdiag(kron(B_1, C), kron(B_2, C)) = kron(blockdiag(B_1, B_2), C)

so the stacked transition is ``kron(I_{d1+d2}, A_1d)``, the preconditioner a
shared ``(n,)`` scale vector, and the noise factor one Kronecker product with
the block-diagonal spatial factor. The latent solver's "layout gymnastics"
(``latent.py:165-215``) disappear: the glued ``(n, 2d)`` mean *is* the
standard point-major layout with ``d' = 2d``. :meth:`as_single_iwp` exposes
that collapsed form; the generic dense methods remain for parity and tests.
"""

import jax.numpy as jnp
import jax.scipy.linalg

from pnmol_tpu.ops import iwp as iwp_module


class StackedSSM:
    def __init__(self, processes):
        self.processes = tuple(processes)
        self._dims = tuple(p.state_dimension for p in self.processes)

    @property
    def state_dimension(self):
        return sum(self._dims)

    # -- structured fast path -------------------------------------------------

    @property
    def is_homogeneous(self):
        """True iff all processes share one Nordsieck order."""
        orders = {p.num_derivatives for p in self.processes}
        return len(orders) == 1

    def as_single_iwp(self):
        """Collapse a homogeneous stack into one IWP over concatenated points."""
        if not self.is_homogeneous:
            raise ValueError("Stacked processes differ in num_derivatives.")
        spatial_factor = jax.scipy.linalg.block_diag(
            *[p.wp_diffusion_sqrtm for p in self.processes]
        )
        return iwp_module.IntegratedWienerTransition(
            num_derivatives=self.processes[0].num_derivatives,
            wiener_process_dimension=sum(
                p.wiener_process_dimension for p in self.processes
            ),
            wp_diffusion_sqrtm=spatial_factor,
        )

    # -- dense parity API -----------------------------------------------------

    @property
    def preconditioned_discretize(self):
        pairs = [p.preconditioned_discretize for p in self.processes]
        A = jax.scipy.linalg.block_diag(*[a for a, _ in pairs])
        Q = jax.scipy.linalg.block_diag(*[q for _, q in pairs])
        return A, Q

    def non_preconditioned_discretize(self, dt):
        pairs = [p.non_preconditioned_discretize(dt) for p in self.processes]
        A = jax.scipy.linalg.block_diag(*[a for a, _ in pairs])
        Q = jax.scipy.linalg.block_diag(*[q for _, q in pairs])
        return A, Q

    def nordsieck_preconditioner(self, dt):
        pairs = [p.nordsieck_preconditioner(dt) for p in self.processes]
        P = jax.scipy.linalg.block_diag(*[a for a, _ in pairs])
        P_inv = jax.scipy.linalg.block_diag(*[b for _, b in pairs])
        return P, P_inv

    def projection_matrix(self, derivative_to_project_onto, process_to_project_onto=None):
        if process_to_project_onto is None:
            return jax.scipy.linalg.block_diag(
                *[p.projection_matrix(derivative_to_project_onto) for p in self.processes]
            )
        assert isinstance(process_to_project_onto, int)
        proj_to_proc = self.projection_to_process(process_to_project_onto)
        proj_to_deriv = self.processes[process_to_project_onto].projection_matrix(
            derivative_to_project_onto
        )
        return proj_to_deriv @ proj_to_proc

    def projection_to_process(self, process_to_project_onto: int):
        start = sum(self._dims[:process_to_project_onto])
        stop = start + self._dims[process_to_project_onto]
        return jnp.eye(self.state_dimension)[start:stop, :]
