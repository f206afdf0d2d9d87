"""Multigrid Monte Carlo sampler - the flagship algorithm.

TPU-native counterpart of ``src/sampler/multigridmc_sampler.{hh,cc}`` (Goodman &
Sokal 1989): a stochastic multigrid V/W-cycle whose smoothers are multi-colour
SOR/SSOR Gibbs sweeps and whose coarse-level "solve" is an exact Cholesky (or
SSOR Gibbs) sample.

Construction mirrors ``multigridmc_sampler.cc:8-100``: per level a
Galerkin-coarsened operator, a forward pre-sampler and a backward post-sampler;
the coarsest level gets a Cholesky or SSOR sampler.  The recursive cycle
(``multigridmc_sampler.cc:103-130``) unrolls at trace time:

    sample(level):
        if coarsest:  x_L ~ coarse_sampler(f_L, x_L)
        else, repeated ``cycle`` times on levels > 0:
            x_l  ~ presampler(f_l, x_l)                     (forward Gibbs)
            f_{l+1} = R (f_l - A_l x_l)
            x_{l+1} = 0;  sample(level+1)
            x_l += coarse_scaling * P x_{l+1}
            x_l  ~ postsampler(f_l, x_l)                    (backward Gibbs)

Chain-state semantics match ``multigridmc_sampler.cc:133-139``: the fine-level x
is carried across calls (NOT zeroed - unlike the deterministic preconditioner),
coarse-level states are zero-initialised at each visit.

The whole cycle is one jittable pure function of ``(key, f, x)`` and batches over
leading chain dimensions, so thousands of independent chains run in lockstep on
one chip - this is where the TPU throughput comes from.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.intergrid import prolongate, prolongate_add, restrict
from ..ops.stencil import StencilOperator
from ..smoothers import BACKWARD, FORWARD
from ..solvers.multigrid import MultigridHierarchy
from .base import Sampler
from .cholesky import DenseCholeskySampler
from .sor import SORSampler, SSORSampler

#: smallest level size (vertex count) for which a fused level-visit Pallas
#: kernel beats the composed XLA visit.  Slope-measured on v5e at 256 chains
#: (NOTES_R2.md): 255^2 (65k) fused wins 1.5x, 127^2 (16k) and below lose
#: (per-block overhead plus XLA's batched intergrid matmuls outpace the
#: in-kernel per-chain ones).  None = resolve per device kind via
#: utils.autotune (known-chip table + one-shot cached slope probe on unknown
#: generations); an int here (env MGMC_FUSED_MIN_VERTICES or a script
#: monkeypatch) wins unconditionally.
MIN_FUSED_VERTICES = (int(os.environ["MGMC_FUSED_MIN_VERTICES"])
                      if os.environ.get("MGMC_FUSED_MIN_VERTICES") else None)


def default_min_fused_vertices() -> int:
    if MIN_FUSED_VERTICES is not None:
        return int(MIN_FUSED_VERTICES)
    from ..utils.autotune import fused_min_vertices

    return fused_min_vertices()


class MultigridMCSampler(Sampler):
    """cf. ``MultigridMCSampler`` (``multigridmc_sampler.hh:24-73``).

    Parameters mirror ``MultigridParameters`` (``parameters.hh:145-174``) plus the
    Cholesky factorisation choice (``parameters.hh:87-91``).
    """

    def __init__(
        self,
        op: StencilOperator,
        nlevel: int,
        smoother: str = "SOR",
        coarse_solver: str = "Cholesky",
        npresmooth: int = 1,
        npostsmooth: int = 1,
        ncoarsesmooth: int = 1,
        omega: float = 1.0,
        cycle: int = 1,
        coarse_scaling: float = 1.0,
        cholesky_factorisation: str = "dense",
        hierarchy: Optional[MultigridHierarchy] = None,
        verbose: int = 0,
        distill: object = "auto",
        fused: object = "auto",
        fused_min_vertices: Optional[int] = None,
        fused_interpret: bool = False,
        sweep_schedule: str = "fixed",
        distill_precision: Optional[str] = None,
    ):
        super().__init__(op)
        self.hierarchy = hierarchy or MultigridHierarchy(op, nlevel)
        self.nlevel = self.hierarchy.nlevel
        self.cycle = int(cycle)
        self.coarse_scaling = float(coarse_scaling)
        sweep_schedule = sweep_schedule.lower()
        if sweep_schedule not in ("fixed", "alternating"):
            raise ValueError(f"invalid sweep_schedule '{sweep_schedule}'")
        self.sweep_schedule = sweep_schedule
        #: MXU precision tier of the distilled-subtree matmuls ("highest" /
        #: "high" / "default"); None defers to MGMC_DISTILL_PRECISION (env,
        #: default "high").  Bias trade-offs: utils/config.py
        #: MultigridParameters docstring + BASELINE.md round-3 scan.
        self.distill_precision = distill_precision

        smoother = smoother.upper()
        self.presamplers = []
        self.postsamplers = []
        for level_op in self.hierarchy.operators:
            if smoother == "SOR":
                self.presamplers.append(SORSampler(level_op, omega, npresmooth, FORWARD))
                self.postsamplers.append(SORSampler(level_op, omega, npostsmooth, BACKWARD))
            elif smoother == "SSOR":
                self.presamplers.append(SSORSampler(level_op, omega, npresmooth))
                self.postsamplers.append(SSORSampler(level_op, omega, npostsmooth))
            else:
                raise ValueError(f"invalid sampler '{smoother}'")

        coarse_op = self.hierarchy.operators[-1]
        if coarse_solver.lower() == "cholesky":
            # The reference switches sparse/dense factorisation here
            # (multigridmc_sampler.cc:52-63); on TPU the coarse level is tiny and
            # must stay jittable inside the cycle, so both choices map to the
            # dense on-device factorisation (distributionally identical).
            self.coarse_sampler = DenseCholeskySampler(coarse_op)
        elif coarse_solver.upper() == "SSOR":
            self.coarse_sampler = SSORSampler(coarse_op, omega, ncoarsesmooth)
        else:
            raise ValueError(f"invalid coarse sampler '{coarse_solver}'")

        if verbose > 0:
            for level, level_op in enumerate(self.hierarchy.operators):
                print(f"  level {level} lattice : {level_op.lattice.get_info()}")

        self._fused_opts = dict(
            force=None if fused == "auto" else bool(fused),
            min_vertices=(default_min_fused_vertices()
                          if fused_min_vertices is None
                          else int(fused_min_vertices)),
            # an explicit threshold also overrides the 3d-specific default
            min_vertices_3d=(None if fused_min_vertices is None
                             else int(fused_min_vertices)),
            interpret=bool(fused_interpret),
        )
        self._build_fused_levels(smoother, npresmooth, npostsmooth)
        self._build_distilled(distill)
        self._build_alternate()

    # ------------------------------------------------- fused level visits
    def _build_fused_levels(self, smoother: str, npresmooth: int, npostsmooth: int):
        """Fused Pallas level-visit kernels (descend = noise+sweep+Woodbury+
        residual+restrict, ascend = prolongate+noise+sweep+Woodbury in one HBM
        round trip each) for batched chains on large-enough 2d levels.

        Enabled by default on a single TPU device (MGMC_FUSED=0 disables,
        MGMC_FUSED=1 forces even when heuristics say no); the composed XLA path
        remains the reference implementation and handles every other case
        (CPU, single chain, sharded/multi-device, 3d, SSOR, nsmooth>1).
        """
        self.fused_levels = {}
        self.subtree = None
        self._smoother_name = smoother
        self._visits_fusable = (smoother in ("SOR", "SSOR")
                                and npresmooth == 1 and npostsmooth == 1)
        # one fused kernel call = one visit (SOR: 1 sweep, SSOR: fwd+bwd)
        if not self._visits_fusable:
            return
        self.fused_levels = self._make_fused(self.presamplers, self.postsamplers)
        self._build_subtree()

    def _make_fused(self, pre, post):
        from ..ops.kernels.mgmc_visit_pallas import fused_levels_for

        return fused_levels_for(
            self.hierarchy.operators, pre, post,
            self.coarse_scaling, self._fused_opts["min_vertices"],
            interpret=self._fused_opts["interpret"],
            force=self._fused_opts["force"],
            min_vertices_3d=self._fused_opts["min_vertices_3d"],
        )

    def _build_subtree(self):
        """One Pallas call for the whole coarse subtree (levels 1..coarsest).

        OPT-IN (MGMC_SUBTREE=1): profiling shows the sub-levels cost ~3.5
        ms/step over ~1300 tiny XLA ops, but the fused subtree measured
        SLOWER (11.1 ms/step vs 5.5 composed at 256 chains; bc 8/32 alike) -
        Mosaic's in-kernel execution of op-rich small-field work cannot match
        XLA's batched fusions, the mirror image of the finest level where the
        fused visits win.  Kept as validated groundwork (exact vs the
        composed recursion on TPU; see NOTES_R2.md)."""
        self.subtree = None
        if os.environ.get("MGMC_SUBTREE", "0") != "1":
            return
        if not self.fused_levels:
            return  # fused gating (backend/device/flag checks) said no
        if self._smoother_name != "SOR" or self.nlevel < 3 or not isinstance(
                self.coarse_sampler, DenseCholeskySampler):
            return
        sub_ops = self.hierarchy.operators[1:]
        if any(len(op.vshape) != 2 or op.coeffs.dtype != jnp.float32
               for op in sub_ops):
            return
        from ..ops.kernels.mgmc_subtree_pallas import SubtreeKernel

        self.subtree = SubtreeKernel(
            sub_ops,
            [p.smoother for p in self.presamplers[1:self.nlevel - 1]],
            [p.smoother for p in self.postsamplers[1:self.nlevel - 1]],
            self.coarse_sampler.L,
            self.presamplers[0].omega, self.cycle, self.coarse_scaling,
        )

    def _build_distilled(self, distill):
        """Affine distillation of the coarse subtree (samplers/distill.py):
        below the distill level the recursion's ~hundreds of latency-bound
        XLA ops are replaced by the subtree's *exact* affine-Gaussian map
        ``x = T f + S xi`` - two fat MXU matmuls per invocation.  Enabled by
        default on a single TPU device for batched chains (MGMC_DISTILL=0
        disables, =1 forces, e.g. for CPU statistical tests)."""
        self.distilled = None
        self.distill_level = None
        if self.subtree is not None:
            return  # the opt-in subtree kernel already covers the sub-levels
        flag = os.environ.get("MGMC_DISTILL", "")
        if flag == "0" or (distill is False and flag != "1"):
            return
        if flag != "1" and distill is not True:
            try:
                if jax.default_backend() != "tpu" or len(jax.devices()) != 1:
                    return
            except RuntimeError:
                return
        from .distill import pick_distill_level

        li = pick_distill_level(self.hierarchy.operators)
        if li is None:
            return
        self.distilled = self._make_distilled(
            li, self.presamplers, self.postsamplers)
        self.distill_level = li

    def _make_distilled(self, li, pre, post):
        from .distill import distill_subtree

        # run the one-time basis propagation on the accelerator even when the
        # sampler is constructed under a CPU default-device context (the
        # propagation is one jitted program; setup-time eager work stays host)
        try:
            accel = [d for d in jax.devices() if d.platform != "cpu"]
        except RuntimeError:
            accel = []
        import contextlib

        ctx = jax.default_device(accel[0]) if accel else contextlib.nullcontext()
        with ctx:
            return distill_subtree(
                self.hierarchy.operators[li:], pre[li:], post[li:],
                self.coarse_sampler, self.cycle, self.coarse_scaling,
                noise=True, precision=self.distill_precision,
            )

    def _build_alternate(self):
        """Parity-1 engine for ``sweep_schedule="alternating"``: the same
        hierarchy with the pre/post sampler roles swapped (odd steps presample
        backward and postsample forward).  Measured on the reference's own
        warmup diagnostic (docs/CONVERGENCE.md round-4 scan): the alternating
        schedule contracts q_mean at 0.505/step at omega=1.4 vs 0.617 for the
        fixed colored schedule and 0.685 for the reference's lexicographic
        order (``sor_smoother.cc:56-78``) - at identical per-step cost.  The
        stationary distribution is exact for either parity (step-dependent
        composition of valid Gibbs kernels)."""
        self._alt = None
        if self.sweep_schedule != "alternating":
            return
        if self.subtree is not None:
            raise ValueError(
                "sweep_schedule='alternating' is unsupported with the opt-in "
                "MGMC_SUBTREE kernel")
        alt_fused = (self._make_fused(self.postsamplers, self.presamplers)
                     if self._visits_fusable else {})
        alt_distilled = None
        if self.distilled is not None:
            alt_distilled = self._make_distilled(
                self.distill_level, self.postsamplers, self.presamplers)
        self._alt = dict(
            presamplers=self.postsamplers, postsamplers=self.presamplers,
            fused_levels=alt_fused, distilled=alt_distilled,
        )

    def _engine(self, parity: int):
        """(presamplers, postsamplers, fused_levels, distilled) for a step
        parity; parity 1 exists only under ``sweep_schedule="alternating"``."""
        if parity and self._alt is not None:
            a = self._alt
            return (a["presamplers"], a["postsamplers"], a["fused_levels"],
                    a["distilled"])
        return (self.presamplers, self.postsamplers, self.fused_levels,
                self.distilled)

    def _sample(self, level: int, key: jax.Array, f: jax.Array, x: jax.Array,
                parity: int = 0, flat: bool = False) -> jax.Array:
        """Recursive stochastic cycle (``multigridmc_sampler.cc:103-130``),
        unrolled at trace time.

        ``flat``: f and x arrive in this level's fused flat-3d storage
        ``(Z, Y*X)`` (only ever True when this level's fused kernel is flat);
        adjacent flat levels hand the coarse rhs/state straight through in
        flat form, so the fused part of a 3d cycle runs without per-level
        relayouts."""
        if level == self.nlevel - 1:
            return self.coarse_sampler.apply(key, f, x)
        presamplers, postsamplers, fused_levels, distilled = self._engine(parity)
        op = self.hierarchy.operators[level]
        vdim = len(op.vshape)
        fused = fused_levels.get(level) if (flat or x.ndim == vdim + 1) else None
        use_flat = fused is not None and getattr(fused, "flat", False)
        if use_flat and not flat:
            f, x = fused._flat_field(f), fused._flat_field(x)
        next_fused = fused_levels.get(level + 1)
        child_flat = (use_flat and next_fused is not None
                      and getattr(next_fused, "flat", False)
                      and not (distilled is not None
                               and level + 1 == self.distill_level))
        ncycle = self.cycle if level > 0 else 1
        for j in range(ncycle):
            kpre, kcoarse, kpost = jax.random.split(jax.random.fold_in(key, j), 3)
            if fused is not None:
                x, out = fused.descend(kpre, f, x, flat_io=use_flat)
                if not fused.fuse_transfers:
                    f_coarse = restrict(out, dim=op.lattice.dim)
                elif use_flat and not child_flat:
                    f_coarse = out.reshape(out.shape[:-2] + fused._vc3)
                else:
                    f_coarse = out
            else:
                x = presamplers[level].apply(kpre, f, x)
                r = f - op.apply(x)
                f_coarse = restrict(r, dim=op.lattice.dim)
            if level == 0 and self.subtree is not None and x.ndim == vdim + 1:
                x_coarse = self.subtree.sample(kcoarse, f_coarse)
            elif (distilled is not None
                  and level + 1 == self.distill_level
                  and f_coarse.ndim > vdim):
                x_coarse = distilled.apply(kcoarse, f_coarse)
            else:
                x_coarse = jnp.zeros_like(f_coarse)
                x_coarse = self._sample(level + 1, kcoarse, f_coarse, x_coarse,
                                        parity, flat=child_flat)
            if fused is not None:
                if not fused.fuse_transfers:
                    xc = prolongate(x_coarse, op.vshape)
                elif use_flat and not child_flat:
                    xc = x_coarse.reshape(x_coarse.shape[:-vdim] + out.shape[-2:])
                else:
                    xc = x_coarse
                x = fused.ascend(kpost, f, x, xc, flat_io=use_flat)
            else:
                x = prolongate_add(self.coarse_scaling, x_coarse, x, dim=op.lattice.dim)
                x = postsamplers[level].apply(kpost, f, x)
        if use_flat and not flat:
            x = fused._unflat_field(x)
        return x

    def apply(self, key: jax.Array, f: jax.Array, x: jax.Array,
              parity: int = 0) -> jax.Array:
        """One MGMC step: chain state x is carried, not zeroed
        (``multigridmc_sampler.cc:133-139``).

        ``parity`` (static 0/1) selects the sweep-direction engine under
        ``sweep_schedule="alternating"`` (odd steps swap the pre/post roles);
        it is ignored under the default fixed schedule.  Step loops alternate
        via a static 2-step unroll - see :meth:`apply_pair`."""
        parity = int(parity) & 1
        _, _, fused_levels, _ = self._engine(parity)
        vdim = len(self.op.vshape)
        if fused_levels and x.ndim > vdim + 1:
            # fused kernels take one flat chain axis; reshape around the cycle
            batch = x.shape[: x.ndim - vdim]
            xf = x.reshape((-1,) + self.op.vshape)
            ff = f
            if f.ndim > vdim:
                ff = jnp.broadcast_to(f, x.shape).reshape(xf.shape)
            out = self._sample(0, key, ff, xf, parity)
            return out.reshape(batch + self.op.vshape)
        return self._sample(0, key, f, x, parity)

    def apply_pair(self, key: jax.Array, f: jax.Array, x: jax.Array) -> jax.Array:
        """Two MGMC steps (parities 0 then 1): the scan body for the
        alternating schedule (under the fixed schedule this is just two
        ordinary steps).  Independent keys per sub-step."""
        k0, k1 = jax.random.split(key)
        return self.apply(k1, f, self.apply(k0, f, x), parity=1)

    def apply_indexed(self, key: jax.Array, f: jax.Array, x: jax.Array,
                      k: jax.Array) -> jax.Array:
        """One step that derives the schedule parity from the (possibly
        traced) step index ``k``: under the alternating schedule both parity
        engines are traced into a ``lax.cond`` and the branch is picked at
        run time, so driver scan loops stay one-step-per-iteration."""
        if self._alt is None:
            return self.apply(key, f, x)
        return jax.lax.cond(
            (jnp.asarray(k) % 2) == 0,
            lambda: self.apply(key, f, x, parity=0),
            lambda: self.apply(key, f, x, parity=1),
        )
