"""Worker process for the real 2-process distributed execution test
(``tests/test_distributed.py``). Not collected by pytest.

Each of the two worker processes owns 4 virtual CPU devices; together
they form one 8-device 'dp' mesh via ``jax.distributed.initialize`` with
a localhost coordinator — the CPU analogue of one process per TPU host
on a pod slice (SURVEY §2.5; the reference has no distributed execution,
absence anchored at /root/reference/main.py:123-135). The Trainer then
runs its production fit(): per-host batch rows through ``BatchLoader`` /
``jax.make_array_from_process_local_data``, cross-process gradient psum
by GSPMD, rank-0-only logging/checkpointing, allgathered validation.

Usage: python distributed_worker.py <port> <pid> <workdir> [model] [tp] [sp] [fsdp]
``model`` defaults to pix2pix; "palette" runs the diffusion task instead
(sampling validation with collective frame gathers + rank-0 PNG writes).
``tp`` > 1 adds Megatron channel sharding on top of dp — the 'tp' axis
then spans the process boundary, so its psums run as real cross-process
collectives. ``fsdp`` = 1 shards params + Adam moments over 'dp' (ZeRO-3)
so the orbax checkpoint writes are genuinely multi-host sharded saves,
then re-runs fit() with --resume from the sharded 'last' slot. Writes
<workdir>/summary_<pid>.json with the fit() summary + the logged
training losses.
"""

import json
import os
import sys


def main():
    port, pid, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    model = sys.argv[4] if len(sys.argv) > 4 else "pix2pix"
    tp = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    sp = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    fsdp = bool(int(sys.argv[7])) if len(sys.argv) > 7 else False
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    jax.config.update("jax_platforms", "cpu")

    from pai_tpu.train.loop import Trainer

    hparams = {
        "name": (f"dist2p_{model}" + (f"_tp{tp}" if tp > 1 else "")
                 + (f"_sp{sp}" if sp > 1 else "")
                 + ("_fsdp" if fsdp else "")),
        "tp": tp,
        "sp": sp,
        "fsdp": fsdp,
        "model": model,
        "data": os.path.join(workdir, "train.yaml"),
        "val_data": os.path.join(workdir, "val.yaml"),
        "epochs": 2 if model == "pix2pix" else 1,
        "steps": -1,
        "batch_size": 8,
        "val_epochs": 2 if model == "pix2pix" else 1,
        "precision": "32",
        "ema": False,
        "channel_mults": "1,2",
        "attention_res": "8,4,2" if model == "pix2pix" else "2",
        "dropout": 0.0,
        "loss_type": "gan" if model == "pix2pix" else "mse",
        "schedule_type": "linear",
        "learn_variance": False,
        "seed": 0,
        "log_dir": os.path.join(workdir, "logs"),
        "ckpt_dir": os.path.join(workdir, "ckpts"),
    }
    trainer = Trainer(hparams, image_size=32)
    assert trainer.process_count == 2, trainer.process_count
    if fsdp:
        # the state really is ZeRO-3 sharded: some param leaf must be
        # partitioned (not replicated) over the cross-process 'dp' axis
        import jax as _jax

        probe = trainer.init_state(_jax.random.key(0))
        assert any(
            hasattr(leaf, "sharding")
            and not leaf.sharding.is_fully_replicated
            for leaf in _jax.tree.leaves(probe)), \
            "fsdp state has no dp-sharded leaf"
    assert trainer.mesh.shape["dp"] == 8 // (tp * sp), \
        dict(trainer.mesh.shape)
    if tp > 1:
        assert trainer.mesh.shape["tp"] == tp, dict(trainer.mesh.shape)
    if sp > 1:
        assert trainer.mesh.shape["sp"] == sp, dict(trainer.mesh.shape)
    summary = trainer.fit()

    if fsdp:
        # resume from the multi-host SHARDED orbax 'last' slot: a fresh
        # Trainer restores every shard onto its owning devices (collective
        # restore) and continues — one more epoch on top of the finished run
        resumed = Trainer(dict(hparams, epochs=hparams["epochs"] + 1,
                               resume=True), image_size=32)
        summary2 = resumed.fit()
        assert summary2["steps"] > summary["steps"], (summary2, summary)
        with open(os.path.join(workdir, f"resume_{pid}.json"), "w") as f:
            json.dump({"summary": summary2}, f)

    losses = None
    if pid == 0:
        import csv

        with open(os.path.join(trainer.logger.log_dir, "metrics.csv")) as f:
            rows = list(csv.DictReader(f))
        losses = [float(r["loss"]) for r in rows if r.get("loss")]
        if model == "palette":
            # sampled validation PNGs: rank-0-only, one per val image
            epoch_dir = os.path.join(trainer.logger.log_dir, "1")
            n_pngs = len(os.listdir(epoch_dir))
            assert n_pngs == 6, (epoch_dir, n_pngs)
    with open(os.path.join(workdir, f"summary_{pid}.json"), "w") as f:
        json.dump({"summary": summary, "losses": losses}, f)
    print(f"[worker {pid}] ok {summary}", flush=True)


if __name__ == "__main__":
    main()
