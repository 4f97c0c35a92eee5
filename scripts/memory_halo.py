"""Per-chip memory: replicated vs the halo-pool sharded-DoF mode on a
HANGING-NODE mesh (the hetero-3d / adaptive production regime that the
tensor-grid lattice mode cannot represent; solvers/halo_newton.py).

Same methodology as scripts/memory_sharded.py (one load step on the
8-virtual-device CPU mesh, jax.live_arrays() walked afterwards,
per-device max of persistent live bytes).  The workload is the
hetero_3d test configuration (3d bitmap material, local pre-refinement
producing hanging nodes) scaled by MEM_GLOBAL/MEM_LOCAL (defaults 2/2).

Writes scripts/memory_halo.json.
"""

import gc
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

from cracks_tpu.config import load_parameters  # noqa: E402
from cracks_tpu.driver import Simulation  # noqa: E402
from memory_sharded import per_device_live_bytes  # noqa: E402

PRM = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "params", "tests", "hetero_3d_1.prm")


def run_mode(dof_sharding, n_global, n_local):
    p = load_parameters(
        PRM, output_dir="", max_no_timesteps=0, direct_solver=False,
        linear_solver="cg", preconditioner="gmg", cg_rtol=1e-8,
        mixed_precision_cg=True, n_devices=8,
        dof_sharding=dof_sharding, n_global_pre_refine=n_global,
        n_local_pre_refine=n_local)
    sim = Simulation(p, verbose=False)
    sim.run()
    n_dofs = sim.mesh.n_dofs
    n_hang = len(sim.mesh.hang_child)
    engaged = bool(getattr(sim.sys, "use_halo_state", False))
    by_dev, n_arrays, repl_b, shard_b, repl_items = \
        per_device_live_bytes()
    bulk = float(sim.statistics.data["Bulk Energy"][-1])
    del sim
    gc.collect()
    jax.clear_caches()
    return dict(n_dofs=n_dofs, n_hanging=n_hang, bulk_energy=bulk,
                halo_engaged=engaged, n_live_arrays=n_arrays,
                per_device_bytes=dict(sorted(by_dev.items())),
                max_device_bytes=max(by_dev.values()),
                total_bytes=sum(by_dev.values()),
                replicated_bytes_per_device=repl_b,
                sharded_bytes_per_device_max=shard_b,
                replicated_top10=[
                    dict(bytes=b, shape=s, dtype=d)
                    for b, s, d in repl_items[:10]])


def main():
    n_global = int(os.environ.get("MEM_GLOBAL", "2"))
    n_local = int(os.environ.get("MEM_LOCAL", "2"))
    out = {"prm": "hetero_3d_1.prm", "n_global": n_global,
           "n_local": n_local, "n_devices": 8}
    for mode in ("replicated", "lattice"):
        out[mode] = run_mode(mode, n_global, n_local)
        tag = ("halo" if out[mode]["halo_engaged"] else mode)
        print(f"# {tag}: dofs={out[mode]['n_dofs']} "
              f"hang={out[mode]['n_hanging']} max/device = "
              f"{out[mode]['max_device_bytes']/1e6:.1f} MB",
              file=sys.stderr)
    assert out["lattice"]["halo_engaged"]
    assert not out["replicated"]["halo_engaged"]
    assert abs(out["lattice"]["bulk_energy"]
               - out["replicated"]["bulk_energy"]) <= \
        1e-8 * abs(out["replicated"]["bulk_energy"]) + 1e-12
    out["max_device_ratio"] = (out["lattice"]["max_device_bytes"]
                               / out["replicated"]["max_device_bytes"])
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "memory_halo.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"max_device_ratio":
                      round(out["max_device_ratio"], 3)}))


if __name__ == "__main__":
    main()
