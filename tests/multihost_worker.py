"""Worker process for the REAL two-process multi-host test.

Launched by tests/test_multihost.py as two separate Python processes that
rendezvous through ``jax.distributed.initialize`` (via setup_runtime's
SR3_MULTIHOST + SR3_COORDINATOR env path — the exact code path a two-node
TPU launch takes), each exposing 4 local CPU devices for a global 8-device
data mesh. Runs one sharded train step on a per-process half of a fixed
global batch and reports the loss + its loader shard as one JSON line.
"""

import json
import os
import sys


def main():
    from sr3_tpu.utils.runtime import setup_runtime

    setup_runtime()  # SR3_PLATFORM=cpu + jax.distributed.initialize(...)

    import jax
    import numpy as np

    pi, pc = jax.process_index(), jax.process_count()

    from sr3_tpu.data.loader import DataLoader
    from sr3_tpu.parallel.mesh import create_mesh
    from sr3_tpu.training.trainer import Trainer
    from sr3_tpu.utils.config import dict_to_nonedict

    ckpt_dir = os.environ["SR3_TEST_CKPT_DIR"]
    opt = dict_to_nonedict({
        "phase": "train",
        "seed": 0,
        "path": {"checkpoint": ckpt_dir, "resume_state": None},
        "datasets": {},
        "model": {
            "which_model_G": "sr3",
            "finetune_norm": False,
            "dtype": "float32",
            "unet": {
                "in_channel": 6, "out_channel": 3, "inner_channel": 8,
                "norm_groups": 4, "channel_multiplier": [1, 2],
                "attn_res": [8], "res_blocks": 1, "dropout": 0.0,
            },
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 10,
                          "linear_start": 1e-6, "linear_end": 1e-2},
            },
            "diffusion": {"image_size": 16, "channels": 3,
                          "conditional": True},
        },
        "train": {"n_iter": 2, "optimizer": {"type": "adam", "lr": 1e-3}},
    })

    mesh = create_mesh()  # all 8 global devices on the 'data' axis
    t = Trainer(opt, mesh=mesh)
    t.set_new_noise_schedule(opt["model"]["beta_schedule"]["train"], "train")

    # fixed global batch; each process feeds only its contiguous half —
    # shard_batch assembles the global array from process-local shards
    rng = np.random.default_rng(0)
    hr = rng.standard_normal((8, 16, 16, 3)).astype(np.float32) * 0.5
    sr = rng.standard_normal((8, 16, 16, 3)).astype(np.float32) * 0.5
    lo, hi = pi * 4, (pi + 1) * 4
    t.feed_data({"HR": hr[lo:hi], "SR": sr[lo:hi]})
    t.optimize_parameters()
    loss = float(np.asarray(jax.device_get(t.log_dict["l_pix"])))

    # the loader's per-process epoch shard, with process_count()==2 for real
    class Toy:
        min_max = (-1, 1)

        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"HR": np.full((2, 2, 3), i, np.float32), "Index": i}

    loader = DataLoader(Toy(), batch_size=2, shuffle=True, seed=7,
                        use_native=False, num_workers=0)
    indices = [int(i) for b in loader for i in b["Index"]]

    # spatial leg: the same step under a (data=4, space=2) mesh, with the
    # 'space' devices SPANNING the two processes — proves the H-sharded
    # activation path (halo exchanges + GN reductions via GSPMD) executes
    # cross-process, not just on a single-process virtual mesh
    # (tests/test_spatial.py). Loss is computed at the same initial params
    # on the same global batch, so it must match the data-mesh loss.
    mesh_sp = create_mesh(num_data=4, num_space=2)
    t_sp = Trainer(opt, mesh=mesh_sp)
    t_sp.set_new_noise_schedule(
        opt["model"]["beta_schedule"]["train"], "train")
    t_sp.feed_data({"HR": hr[lo:hi], "SR": sr[lo:hi]})
    t_sp.optimize_parameters()
    loss_spatial = float(np.asarray(jax.device_get(t_sp.log_dict["l_pix"])))

    # checkpoint save -> resume across BOTH processes: save_network is a
    # collective (host_fetch allgather) with a process-0-only orbax write;
    # wait_for_checkpoints barriers durability so process 1 cannot resume
    # from a half-written directory (trainer.py save_network/load_network)
    t.save_network(epoch=1, iter_step=2)
    t.wait_for_checkpoints()
    resume_opt = json.loads(json.dumps(opt))
    from sr3_tpu.utils.config import dict_to_nonedict as _dn

    resume_opt = _dn(resume_opt)
    resume_opt["path"]["resume_state"] = os.path.join(ckpt_dir, "I2_E1")
    t2 = Trainer(resume_opt, mesh=create_mesh())  # __init__ restores
    from sr3_tpu.parallel.mesh import host_fetch

    leaves = jax.tree_util.tree_leaves(host_fetch(t2.state.params))
    param_checksum = float(sum(np.abs(l).sum() for l in leaves))
    resumed_iter = int(t2.begin_step)

    # batched val across the two processes: every process feeds the SAME
    # full item stream (val loaders do not shard across processes); the
    # grouped evaluator runs each group as ONE global collective chain and
    # host_fetch hands every process the full output
    from sr3_tpu.training.evaluation import GroupedEvaluator

    t2.set_new_noise_schedule(
        opt["model"]["beta_schedule"]["train"], "val")
    ev = GroupedEvaluator(t2, group_size=8,
                          base_rng=jax.random.PRNGKey(123))
    items = [{"SR": sr[i], "HR": hr[i]} for i in range(3)]
    outs = [out for _, out in ev.run_sr(iter(items), continous=False)]
    val_checksum = float(sum(np.abs(o).sum() for o in outs))
    assert len(outs) == 3 and outs[0].shape == (16, 16, 3)

    print(json.dumps({
        "process": pi,
        "process_count": pc,
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "loss": loss,
        "loss_spatial": loss_spatial,
        "indices": indices,
        "param_checksum": param_checksum,
        "resumed_iter": resumed_iter,
        "val_checksum": val_checksum,
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
