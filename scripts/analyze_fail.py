"""Offline (CPU) dissection of a dumped failing u-pass state
(CRACKS_TPU_DUMP_FAIL from solvers/lattice._solve_split).

Rebuilds the refine-6 Sneddon lattice system on host, reproduces the
f32 CG pass failure, and instruments the first CG iterations (alpha,
denom, Z0 stats) plus tests candidate fixes (symmetric Jacobi scaling).

Usage: python scripts/analyze_fail.py /tmp/fail_state.npz [refine]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ON_TPU = os.environ.get("ANALYZE_TPU") == "1"
if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fail_state.npz"
refine = int(sys.argv[2]) if len(sys.argv) > 2 else 6

d = np.load(path)
u = jnp.asarray(d["u"])
phi = jnp.asarray(d["phi"])
phi_old = jnp.asarray(d["phi_old"])
phi_oold = jnp.asarray(d["phi_oold"])
active = jnp.asarray(d["active"])
b = jnp.asarray(d["b"])
which = str(d["which"])
mark(f"loaded dump: which={which} |b|={float(jnp.linalg.norm(b)):.6e} "
     f"active={int(active.sum())}")

import bench  # noqa: E402
from cracks_tpu.driver import Simulation  # noqa: E402
from cracks_tpu.ops import physics  # noqa: E402
from cracks_tpu.solvers import lattice  # noqa: E402

p = bench._make_params(refine, "float64", "gmg", 1)
sim = Simulation(p, verbose=False)
sim.setup_system()
sim.determine_mesh_dependent_parameters()
sim.time = p.timestep_size
sim._set_context()
sys_ = sim.sys
sc = physics.Scalars(*[jnp.asarray(v) for v in np.asarray(d["scalars"])])
sys_.scalars = sc
hier = sys_.lattice_hierarchy
grid = hier.grid
mark(f"system rebuilt: grid={grid} n_levels={hier.n_levels}")

kw = dict(dim=2, with_split=False, monolithic=False)
jacs = lattice._prepare(u, phi, phi_old, phi_oold, sys_.lattice_ca32,
                        sys_.scalars, hier.P_embed, grid=grid,
                        n_levels=hier.n_levels, **kw)
mark("f32 jacs built")

use_pallas = ON_TPU and os.environ.get("ANALYZE_PALLAS", "1") == "1"
levels, coarse32, fine_pad = lattice._prepare_levels(
    jacs, hier.dir_u, hier.dir_p, hier.vert_pos, active, grid=grid,
    which=which, dim=2, pallas=use_pallas)
mark(f"levels built (pallas={use_pallas})")

k, lo, hi = lattice._blk(which, 2)
fin = levels[-1]

setup = lattice._pass_setup(fin.free, hier.vert_pos, b, 1e-8,
                            jnp.asarray(1e-24), grid=grid, which=which,
                            dim=2)
R0, scale, tol2, rr0 = setup
mark(f"pass setup: rr0={float(rr0):.6e} R0max={float(jnp.max(jnp.abs(R0))):.3e}")

# --- reproduce the pass ---
Xb, kk, rrb = lattice._cg_pass32(levels, coarse32,
                                 fine_pad if use_pallas else None,
                                 R0, tol2, grid=grid, which=which,
                                 dim=2, inner_max=96)
mark(f"REPRO(pallas={use_pallas}): its={int(kk)} rrb={float(rrb):.3e} "
     f"|Xb|max={float(jnp.max(jnp.abs(Xb))):.3e}")

if ON_TPU:
    # compare the Pallas stencil matvec against XLA slices on THIS system
    from cracks_tpu.ops import pallas_stencil as ps
    GY, GX = grid
    rng = np.random.default_rng(0)
    Xr = jnp.asarray(rng.standard_normal((k,) + tuple(grid)),
                     jnp.float32)
    Xr = jnp.where(fin.free, Xr, 0.0)
    Y_xla = jnp.where(fin.free, lattice.matvec(fin.jac, Xr, lo, hi, k),
                      0.0)
    JP = ps.pad_jac(fin.jac[lo:hi, lo:hi])
    Y_pal = jnp.where(fin.free,
                      ps.stencil_matvec_prepadded(JP, Xr, k=k, GY=GY,
                                                  GX=GX), 0.0)
    dn = float(jnp.linalg.norm(Y_xla - Y_pal))
    yn = float(jnp.linalg.norm(Y_xla))
    mark(f"pallas-vs-xla on random X: rel={dn / max(yn, 1e-30):.3e} "
         f"|Y|={yn:.3e}")
    # and on R0 itself (the actual failing input)
    Y1 = jnp.where(fin.free, lattice.matvec(fin.jac, R0, lo, hi, k), 0.0)
    Y2 = jnp.where(fin.free,
                   ps.stencil_matvec_prepadded(JP, R0, k=k, GY=GY,
                                               GX=GX), 0.0)
    dn = float(jnp.linalg.norm(Y1 - Y2))
    yn = float(jnp.linalg.norm(Y1))
    mark(f"pallas-vs-xla on R0: rel={dn / max(yn, 1e-30):.3e} "
         f"|Y|={yn:.3e}")

# --- dissect the first iterations manually ---
M32 = lattice.make_vcycle(list(levels), lo, hi, k, degree=2,
                          coarse_factor=coarse32)
op32 = lattice._masked_mv(fin, lo, hi, k)
Z0 = M32(R0)
mark(f"Z0: max={float(jnp.max(jnp.abs(Z0))):.3e} "
     f"nonfinite={bool(jnp.any(~jnp.isfinite(Z0)))}")
rz = jnp.vdot(R0, Z0)
Ap = op32(Z0)
denom = jnp.vdot(Z0, Ap)
mark(f"rz={float(rz):.6e} denom={float(denom):.6e} "
     f"alpha={float(rz/denom) if float(denom)!=0 else float('nan'):.6e}")
X1 = (rz / denom) * Z0
R1 = R0 - (rz / denom) * Ap
mark(f"after 1 CG it: rr={float(jnp.vdot(R1,R1).real):.6e}")

# energy check: is the V-cycle SPD-ish? <R0, M R0> should be > 0
mark(f"<R0, Z0> = {float(rz):.3e} (should be > 0)")

# --- candidate fix: symmetric Jacobi scaling of the pass system ---
S = jnp.sqrt(jnp.where(fin.free, jnp.abs(fin.Dinv), 1.0)).astype(jnp.float32)


def op_scaled(Xs):
    return S * op32(S * Xs)


# solve (S A S) Xs = S R0 with S = D^{-1/2}; then X = S Xs
Rs0 = jnp.where(fin.free, S * R0, 0.0)

# plain CG on the scaled system with diag=1 (Jacobi built in)
X = jnp.zeros_like(R0)
R = Rs0
P = R
rr = jnp.vdot(R, R).real
rr_hist = [float(rr)]
for i in range(60):
    Ap = op_scaled(P)
    dn = jnp.vdot(P, Ap)
    al = jnp.where(dn != 0, jnp.vdot(R, P) / dn, 0.0)
    X = X + al * P
    R = R - al * Ap
    rr_new = jnp.vdot(R, R).real
    beta = rr_new / rr
    P = R + beta * P
    rr = rr_new
    rr_hist.append(float(rr))
mark(f"scaled plain-CG 60 its: rr {rr_hist[0]:.3e} -> {rr_hist[-1]:.3e}")
print("hist:", [f"{v:.2e}" for v in rr_hist[::6]])
