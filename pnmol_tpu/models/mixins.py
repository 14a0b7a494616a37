"""Composable PDE-problem capabilities: discretization, IVP structure,
boundary conditions, nonlinearities.

Capability parity with ``/root/reference/src/pnmol/pde/mixins.py``. The
reference's ``to_tornadox_ivp`` escape hatch becomes ``to_ivp`` returning this
framework's own :class:`pnmol_tpu.odetools.ivp.InitialValueProblem`
(the external ``tornadox`` dependency is replaced in-house, SURVEY.md §1);
a ``to_tornadox_ivp`` alias is kept for drop-in compatibility.
"""

import functools

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from pnmol_tpu import discretize


class DiscretizationMixIn:
    """Probabilistic spatial discretization for scalar PDEs.

    ``scheme="fd"`` (default) uses localized probabilistic finite differences;
    ``scheme="collocation"`` uses dense global collocation
    (``discretize.collocation_global`` — the reference implements it but never
    wires it into the problem layer, ``figure2.py:123-131`` uses it directly).
    """

    def discretize(
        self,
        *,
        mesh_spatial,
        kernel,
        stencil_size_interior,
        stencil_size_boundary,
        nugget_gram_matrix=0.0,
        scheme="fd",
    ):
        if scheme == "fd":
            L, E_sqrtm = discretize.fd_probabilistic(
                self.diffop,
                mesh_spatial=mesh_spatial,
                kernel=kernel,
                stencil_size_interior=stencil_size_interior,
                stencil_size_boundary=stencil_size_boundary,
                nugget_gram_matrix=nugget_gram_matrix,
            )
        elif scheme == "collocation":
            L, E_sqrtm = discretize.collocation_global(
                self.diffop,
                mesh_spatial=mesh_spatial,
                kernel=kernel,
                nugget_gram_matrix=max(nugget_gram_matrix, 1e-12),
                nugget_cholesky_E=1e-12,
                symmetrize_cholesky_E=True,
            )
        else:
            raise ValueError(f"Unknown discretization scheme: {scheme!r}")
        self.L = self.diffop_scale * L
        self.E_sqrtm = self.diffop_scale * E_sqrtm
        self.mesh_spatial = mesh_spatial

        if isinstance(self, NeumannMixIn):
            if self.dimension > 1:
                # n-D directional kernel FD (beyond the reference, which is
                # 1-D only — /root/reference/src/pnmol/pde/mixins.py:41-49)
                self.B, self.R_sqrtm = discretize.fd_probabilistic_neumann(
                    mesh_spatial=mesh_spatial,
                    kernel=kernel,
                    stencil_size=stencil_size_boundary,
                    nugget_gram_matrix=nugget_gram_matrix,
                )
            else:
                self.B, self.R_sqrtm = discretize.fd_probabilistic_neumann_1d(
                    mesh_spatial=mesh_spatial,
                    kernel=kernel,
                    stencil_size=2,
                    nugget_gram_matrix=nugget_gram_matrix,
                )
        elif isinstance(self, DirichletMixIn):
            self.B = mesh_spatial.boundary_projection_matrix
            self.R_sqrtm = jnp.zeros((self.B.shape[0], self.B.shape[0]))

        if isinstance(self, IVPMixIn):
            # Scalar initial value: slice the zeroth dimension.
            self.y0 = self.y0_fun(mesh_spatial.points)[:, 0]


class SystemDiscretizationMixIn:
    """Discretization for systems of PDEs: per-species FD, block-diag glue."""

    def discretize_system(
        self,
        *,
        mesh_spatial,
        kernel,
        stencil_size_interior,
        stencil_size_boundary,
        nugget_gram_matrix=0.0,
    ):
        fd = functools.partial(
            discretize.fd_probabilistic,
            mesh_spatial=mesh_spatial,
            kernel=kernel,
            stencil_size_interior=stencil_size_interior,
            stencil_size_boundary=stencil_size_boundary,
            nugget_gram_matrix=nugget_gram_matrix,
        )
        blocks = [
            (scale * L, scale * E)
            for scale, (L, E) in zip(self.diffop_scale, map(fd, self.diffop))
        ]
        self.L = jax.scipy.linalg.block_diag(*[L for L, _ in blocks])
        self.E_sqrtm = jax.scipy.linalg.block_diag(*[E for _, E in blocks])
        self.mesh_spatial = mesh_spatial

        if isinstance(self, _BoundaryConditionMixInInterface):
            if isinstance(self, (NeumannMixIn, SystemNeumannMixIn)):
                if self.dimension > 1:
                    # n-D directional kernel FD (see DiscretizationMixIn)
                    B, R_sqrtm = discretize.fd_probabilistic_neumann(
                        mesh_spatial=mesh_spatial,
                        kernel=kernel,
                        stencil_size=stencil_size_boundary,
                        nugget_gram_matrix=nugget_gram_matrix,
                    )
                else:
                    B, R_sqrtm = discretize.fd_probabilistic_neumann_1d(
                        mesh_spatial=mesh_spatial,
                        kernel=kernel,
                        stencil_size=2,
                        nugget_gram_matrix=nugget_gram_matrix,
                    )
            elif isinstance(self, (DirichletMixIn, SystemDirichletMixIn)):
                B = mesh_spatial.boundary_projection_matrix
                R_sqrtm = jnp.zeros((B.shape[0], B.shape[0]))
            n = len(self.diffop)
            self.B = jax.scipy.linalg.block_diag(*([B] * n))
            self.R_sqrtm = jax.scipy.linalg.block_diag(*([R_sqrtm] * n))

        if isinstance(self, IVPMixIn):
            self.y0 = self.y0_fun(mesh_spatial.points).squeeze()


class IVPMixIn:
    """Evolution-equation structure: time span plus initial-value function."""

    def __init__(self, *, t0, tmax, y0_fun, **kwargs):
        self.t0 = t0
        self.tmax = tmax
        self.y0_fun = y0_fun
        self.y0 = None  # filled by discretize()
        super().__init__(**kwargs)

    @property
    def t_span(self):
        return self.t0, self.tmax


class _IVPConversionMixInInterface:
    """Interface for method-of-lines conversion mixins."""

    def to_ivp(self):
        raise NotImplementedError

    # Drop-in name compatibility with the reference API.
    def to_tornadox_ivp(self):
        return self.to_ivp()

    def _check_ivp_conversion_conditions(self):
        if not isinstance(self, _BoundaryConditionMixInInterface):
            raise Exception(
                "Conversion to an IVP requires boundary condition functionality."
            )
        if not isinstance(self, IVPMixIn):
            raise Exception("Conversion to an IVP requires IVP functionality.")
        if self.L is None:
            raise AttributeError("Conversion to an IVP requires prior discretization.")
        if self.dimension > 1:
            raise NotImplementedError(
                "IVP conversion beyond one spatial dimension is not supported."
            )


class IVPConversionLinearMixIn(_IVPConversionMixInInterface):
    """Method-of-lines conversion for linear PDEs: the boundary rows are
    eliminated through bc-aware padding (reference: ``mixins.py:174-191``)."""

    def to_ivp(self):
        from pnmol_tpu.odetools import ivp as ivp_module

        self._check_ivp_conversion_conditions()

        @jax.jit
        def f_new(_, x):
            return self.bc_remove_pad(self.L @ self.bc_pad(x))

        df_new = jax.jit(jax.jacfwd(f_new, argnums=1))
        return ivp_module.InitialValueProblem(
            f=f_new,
            df=df_new,
            df_diagonal=None,
            y0=self.bc_remove_pad(self.y0),
            t0=self.t0,
            tmax=self.tmax,
        )


class IVPConversionSemiLinearMixIn(_IVPConversionMixInInterface):
    """Method-of-lines conversion for semilinear PDEs."""

    def to_ivp(self):
        from pnmol_tpu.odetools import ivp as ivp_module

        self._check_ivp_conversion_conditions()

        @jax.jit
        def f_new(t, x):
            x_padded = self.bc_pad(x)
            return self.bc_remove_pad(self.L @ x_padded + self.f(t, x_padded))

        df_new = jax.jit(jax.jacfwd(f_new, argnums=1))
        return ivp_module.InitialValueProblem(
            f=f_new,
            df=df_new,
            df_diagonal=None,
            y0=self.bc_remove_pad(self.y0),
            t0=self.t0,
            tmax=self.tmax,
        )


class _BoundaryConditionMixInInterface:
    def __init__(self, **kwargs):
        self.B = None
        self.R_sqrtm = None
        super().__init__(**kwargs)

    def bc_pad(self, x):
        raise NotImplementedError

    def bc_remove_pad(self, x):
        raise NotImplementedError


class NeumannMixIn(_BoundaryConditionMixInInterface):
    """Zero-flux boundaries: pad with edge values."""

    def bc_pad(self, x):
        return jnp.pad(x, pad_width=1, mode="edge")

    def bc_remove_pad(self, x):
        return x[1:-1]


class DirichletMixIn(_BoundaryConditionMixInInterface):
    """Zero-value boundaries: pad with zeros."""

    def bc_pad(self, x):
        return jnp.pad(x, pad_width=1, mode="constant", constant_values=0.0)

    def bc_remove_pad(self, x):
        return x[1:-1]


class _SystemBoundaryConditionMixinInterface(_BoundaryConditionMixInInterface):
    """Apply a scalar BC rule block-wise to each species of a system."""

    def __init__(self, *, bc, **kwargs):
        self.bc = bc
        super().__init__(**kwargs)

    def bc_pad(self, x):
        per_species = x.reshape((len(self.diffop), -1))
        return jax.vmap(self.bc.bc_pad)(per_species).reshape(-1)

    def bc_remove_pad(self, x):
        per_species = x.reshape((len(self.diffop), -1))
        return jax.vmap(self.bc.bc_remove_pad)(per_species).reshape(-1)


class SystemNeumannMixIn(_SystemBoundaryConditionMixinInterface):
    def __init__(self, **kwargs):
        super().__init__(bc=NeumannMixIn(), **kwargs)


class SystemDirichletMixIn(_SystemBoundaryConditionMixinInterface):
    def __init__(self, **kwargs):
        super().__init__(bc=DirichletMixIn(), **kwargs)


class NonLinearMixIn:
    """Semilinear right-hand side: f, its Jacobian, and optionally its diagonal."""

    def __init__(self, *, f, df, df_diagonal, **kwargs):
        self.f = f
        self.df = df
        self.df_diagonal = df_diagonal
        super().__init__(**kwargs)
