"""Locate the first NaN in the lattice V-cycle on the TPU for the
dumped failing u-system.  Usage:
    ANALYZE_TPU=1 python scripts/analyze_nan.py /tmp/fail_state.npz 6
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
levels, coarse32, _ = lattice._prepare_levels(
    jacs, hier.dir_u, hier.dir_p, hier.vert_pos, active, grid=grid,
    which=which, dim=2, pallas=False)
mark("levels built")

k, lo, hi = lattice._blk(which, 2)

cho_c, scale_c = coarse32
mark(f"coarse32 factor: nonfinite={bool(jnp.any(~jnp.isfinite(cho_c)))} "
     f"max={float(jnp.max(jnp.abs(cho_c))):.3e} "
     f"scale nonfinite={bool(jnp.any(~jnp.isfinite(scale_c)))} "
     f"scale max={float(jnp.max(jnp.abs(scale_c))):.3e}")

# rebuild the f64 coarse factor OUTSIDE jit on TPU and on host for
# comparison
lv0 = levels[0]
(cho64, low), s64 = lattice._coarse_dense_factor(lv0, lo, hi, k)
mark(f"f64 TPU cho_factor: nonfinite={bool(jnp.any(~jnp.isfinite(cho64)))} "
     f"max={float(jnp.max(jnp.abs(cho64))):.3e}")

# host (numpy) factorization of the same dense matrix
import numpy.linalg as npl

g0 = lv0.free.shape[1:]
nvert0 = int(np.prod(g0))
n0 = k * nvert0
pos = jnp.arange(nvert0).reshape(g0)
offs = lattice._offsets(len(g0))
wins = jnp.stack([pos[tuple(slice(o[j], g0[j] - 1 + o[j])
                            for j in range(len(g0)))] for o in offs])
comp = jnp.arange(k)
lflat = (comp[None, :, None] * nvert0
         + wins.reshape(len(offs), 1, -1)).reshape((hi - lo), -1)
A = np.asarray(lv0.jac[lo:hi, lo:hi].reshape(hi - lo, hi - lo, -1),
               np.float64)
lf = np.asarray(lflat)
A0 = np.zeros((n0, n0))
for i in range(hi - lo):
    for j in range(hi - lo):
        np.add.at(A0, (lf[i], lf[j]), A[i, j])
m = np.asarray(lv0.free.reshape(-1))
A0 = np.where(m[:, None] & m[None, :], A0, 0.0)
A0 = A0 + np.diag(np.where(m, 0.0, 1.0))
s = 1.0 / np.sqrt(np.abs(np.diagonal(A0)))
A0s = A0 * s[:, None] * s[None, :]
ev = npl.eigvalsh(A0s)
mark(f"host coarse scaled eigs: min={ev.min():.6e} max={ev.max():.6e}")
try:
    npl.cholesky(A0s)
    mark("host cholesky: OK")
except npl.LinAlgError as e:
    mark(f"host cholesky FAILED: {e}")

# step through one V-cycle level by level looking for the first NaN
setup = lattice._pass_setup(levels[-1].free, hier.vert_pos, b, 1e-8,
                            jnp.asarray(1e-24), grid=grid, which=which,
                            dim=2)
R0 = setup[0]

L = len(levels)
nf = lambda x: bool(jnp.any(~jnp.isfinite(x)))


def probe_cycle(l, bb):
    lv = levels[l]
    bb = jnp.where(lv.free, bb, 0.0)
    if l == 0:
        bs = scale_c * bb.reshape(-1).astype(cho_c.dtype)
        x = (scale_c * jax.scipy.linalg.cho_solve((cho_c, False), bs)
             ).astype(bb.dtype).reshape(lv0.free.shape)
        mark(f"  L0 coarse solve: in nf={nf(bs)} out nf={nf(x)} "
             f"max={float(jnp.max(jnp.abs(x))):.3e}")
        return jnp.where(lv.free, x, 0.0)
    op = lattice._masked_mv(lv, lo, hi, k)
    x = lattice._chebyshev(op, lv.Dinv, bb, lv.lam, 2)
    mark(f"  L{l} pre-smooth: nf={nf(x)} max={float(jnp.max(jnp.abs(x))):.3e}")
    r = bb - op(x)
    r_c = lattice.restrict(r, k)
    mark(f"  L{l} restricted residual: nf={nf(r_c)} "
         f"max={float(jnp.max(jnp.abs(r_c))):.3e}")
    e_c = probe_cycle(l - 1, r_c)
    g = lv.free.shape[1:]
    x = x + jnp.where(lv.free, lattice.prolong(e_c, g, k), 0.0)
    r = bb - op(x)
    x = x + lattice._chebyshev(op, lv.Dinv, r, lv.lam, 2)
    mark(f"  L{l} post-smooth: nf={nf(x)} max={float(jnp.max(jnp.abs(x))):.3e}")
    return x


Z0 = probe_cycle(L - 1, R0)
mark(f"Z0: nf={nf(Z0)} max={float(jnp.max(jnp.abs(Z0))):.3e}")
