"""Typed experiment/solver configuration (SURVEY.md §5: the reference has no
config system — kwargs and module-level constants only).

Frozen dataclasses bundle the problem recipe, solver choice, and run
settings; ``build()`` materializes (pde, solver). Defaults mirror the
reference's (``/root/reference/src/pnmol/pdefilter.py:37-70``,
``pde/examples.py:13-26``)."""

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    family: str = "heat"  # heat | spruce | sir | lotka_volterra
    dx: float = 0.05
    t0: float = 0.0
    tmax: float = 5.0
    bcond: str = "dirichlet"
    stencil_size_interior: int = 3
    stencil_size_boundary: int = 3
    nugget_gram_matrix_fd: float = 0.0
    extra: Tuple[Tuple[str, float], ...] = ()

    def build(self):
        from pnmol_tpu.models import examples

        kwargs = dict(
            dx=self.dx,
            t0=self.t0,
            tmax=self.tmax,
            stencil_size_interior=self.stencil_size_interior,
            stencil_size_boundary=self.stencil_size_boundary,
            nugget_gram_matrix_fd=self.nugget_gram_matrix_fd,
            **dict(self.extra),
        )
        if self.family == "heat":
            return examples.heat_1d_discretized(bcond=self.bcond, **kwargs)
        if self.family == "spruce":
            return examples.spruce_budworm_1d_discretized(bcond=self.bcond, **kwargs)
        if self.family == "sir":
            return examples.sir_1d_discretized(**kwargs)
        if self.family == "lotka_volterra":
            return examples.lotka_volterra_1d_discretized(**kwargs)
        raise ValueError(f"Unknown problem family: {self.family!r}")


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    method: str = "white"  # white | latent
    linearity: str = "linear"  # linear | semilinear
    num_derivatives: int = 2
    diffuse_prior_scale: float = 1.0
    # step rule
    steprule: str = "adaptive"  # adaptive | constant
    dt: Optional[float] = None  # required for constant
    abstol: float = 1e-4
    reltol: float = 1e-2
    # spatial prior kernel
    prior_kernel: str = "matern52+white"  # matern52+white | matern52 | sqexp
    prior_input_scale: float = 1.0
    prior_duplicates: int = 1  # >1 for PDE systems

    def _kernel(self):
        from pnmol_tpu import kernels

        base = {
            "matern52+white": lambda: kernels.Matern52(input_scale=self.prior_input_scale)
            + kernels.WhiteNoise(),
            "matern52": lambda: kernels.Matern52(input_scale=self.prior_input_scale),
            "sqexp": lambda: kernels.SquareExponential(
                input_scale=self.prior_input_scale
            ),
        }[self.prior_kernel]()
        if self.prior_duplicates > 1:
            return kernels.duplicate(base, self.prior_duplicates)
        return base

    def _steprule(self):
        from pnmol_tpu.odetools import step

        if self.steprule == "constant":
            if self.dt is None:
                raise ValueError("Constant steps require dt.")
            return step.Constant(self.dt)
        return step.Adaptive(abstol=self.abstol, reltol=self.reltol)

    def build(self):
        from pnmol_tpu.solvers import latent, white

        cls = {
            ("white", "linear"): white.LinearWhiteNoiseEK1,
            ("white", "semilinear"): white.SemiLinearWhiteNoiseEK1,
            ("latent", "linear"): latent.LinearLatentForceEK1,
            ("latent", "semilinear"): latent.SemiLinearLatentForceEK1,
        }[(self.method, self.linearity)]
        return cls(
            num_derivatives=self.num_derivatives,
            steprule=self._steprule(),
            spatial_kernel=self._kernel(),
            diffuse_prior_scale=self.diffuse_prior_scale,
        )


@dataclasses.dataclass(frozen=True)
class RunConfig:
    problem: ProblemConfig = ProblemConfig()
    solver: SolverConfig = SolverConfig()

    def build(self):
        return self.problem.build(), self.solver.build()
