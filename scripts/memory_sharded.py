"""Per-chip memory: replicated vs sharded-DoF production modes.

Runs one Sneddon load step on the 8-virtual-device CPU mesh in both
multi-chip modes and walks jax.live_arrays() afterwards, attributing
each array's shard bytes to the device that holds it.  The metric is
the per-device maximum of persistent live bytes — the quantity that
decides whether a problem fits a 16 GB v5e chip.

Writes scripts/memory_sharded.json.  MEM_REFINE overrides the mesh size
(default 3 -> 19,803 DoFs; the ratio, not the absolute size, is the
point — every persistent term scales linearly in DoFs).
"""

import collections
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

from cracks_tpu.config import Parameters  # noqa: E402
from cracks_tpu.driver import Simulation  # noqa: E402


def per_device_live_bytes():
    gc.collect()
    by_dev = collections.Counter()
    n_arrays = 0
    repl_bytes = 0    # bytes/device sitting in fully-replicated arrays
    shard_bytes = 0   # bytes/device (max) sitting in sharded arrays
    repl_items = []   # itemization of the replicated term
    for arr in jax.live_arrays():
        try:
            shards = arr.addressable_shards
        except Exception:
            continue
        n_arrays += 1
        per_arr = collections.Counter()
        for s in shards:
            by_dev[s.device.id] += s.data.nbytes
            per_arr[s.device.id] += s.data.nbytes
        if arr.sharding.is_fully_replicated:
            repl_bytes += arr.nbytes
            repl_items.append((arr.nbytes, str(arr.shape),
                               str(arr.dtype)))
        elif per_arr:
            shard_bytes += max(per_arr.values())
    repl_items.sort(reverse=True)
    return by_dev, n_arrays, repl_bytes, shard_bytes, repl_items


def run_mode(dof_sharding, refine):
    # force the split-dispatch solve in BOTH modes (production behavior
    # at >150k DoFs): it persists the stored-operator caches, which
    # dominate per-chip memory, so comparing against the fused path
    # would understate the replicated mode
    from cracks_tpu.solvers import lattice
    lattice.FUSED_SOLVE_MAX_DOFS = 0
    p = Parameters(
        test_case="sneddon", pressure_expr="1.0e-3", G_c=1.0,
        poisson_ratio_nu=0.2, E_modulus=1.0, k_reg_expr="1e-8*h",
        eps_reg_expr="2.0*h", lower_bound_newton_residual=1e-7,
        max_no_newton_steps=50, max_no_line_search_steps=10,
        n_global_pre_refine=refine, max_no_timesteps=0, output_dir="",
        linear_solver="cg", preconditioner="gmg", cg_rtol=1e-8,
        mixed_precision_cg=True, n_devices=8, dof_sharding=dof_sharding)
    sim = Simulation(p, verbose=False)
    sim.run()
    n_dofs = sim.mesh.n_dofs
    by_dev, n_arrays, repl_b, shard_b, repl_items = \
        per_device_live_bytes()
    bulk = float(sim.statistics.data["Bulk Energy"][-1])
    del sim
    gc.collect()
    jax.clear_caches()
    return dict(n_dofs=n_dofs, bulk_energy=bulk, n_live_arrays=n_arrays,
                per_device_bytes=dict(sorted(by_dev.items())),
                max_device_bytes=max(by_dev.values()),
                total_bytes=sum(by_dev.values()),
                replicated_bytes_per_device=repl_b,
                sharded_bytes_per_device_max=shard_b,
                replicated_top10=[
                    dict(bytes=b, shape=s, dtype=d)
                    for b, s, d in repl_items[:10]])


def main():
    refine = int(os.environ.get("MEM_REFINE", "3"))
    out = {"refine": refine, "n_devices": 8}
    for mode in ("replicated", "lattice"):
        out[mode] = run_mode(mode, refine)
        print(f"# {mode}: max/device = "
              f"{out[mode]['max_device_bytes']/1e6:.1f} MB, total "
              f"{out[mode]['total_bytes']/1e6:.1f} MB across 8 devices",
              file=sys.stderr)
    out["max_device_ratio"] = (out["lattice"]["max_device_bytes"]
                               / out["replicated"]["max_device_bytes"])
    name = ("memory_sharded.json" if refine == 4
            else f"memory_sharded_refine{refine}.json")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"max_device_ratio":
                      round(out["max_device_ratio"], 3)}))


if __name__ == "__main__":
    main()
