"""Multi-host (multi-process) simulation: 2 controller processes, loopback.

Exercises the paths a real pod-slice run uses and nothing else can test
single-process: jax.distributed wireup, per-process dataset sharding,
cross-process collectives inside the sharded train step, process-0-only
checkpointing, and the MLPerf logger's global barrier.
"""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys, json
proc_id = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
root = sys.argv[4]; outdir = sys.argv[5]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs, process_id=proc_id,
)
assert jax.process_count() == nprocs
assert jax.device_count() == 2 * nprocs

sys.path.insert(0, os.getcwd())  # Popen cwd = repo root
import numpy as np
import jax.numpy as jnp
from deepcam_tpu.core import mesh as meshlib
from deepcam_tpu.data.dataset import CamDataset
from deepcam_tpu.models.deeplab import DeepLabv3plus
from deepcam_tpu.parallel.collectives import allreduce_sum_scalar, broadcast_from_host0
from deepcam_tpu.train.losses import class_weights
from deepcam_tpu.train.optim import build_optimizer
from deepcam_tpu.train.trainer import create_train_state, make_train_step
from jax.experimental import multihost_utils

# per-process dataset shard (reference comm_size/comm_rank semantics)
ds = CamDataset(os.path.join(root, "train"), os.path.join(root, "stats.h5"),
                channels=list(range(16)), comm_size=nprocs, comm_rank=proc_id)
assert ds.local_size == 8 // nprocs

# sharded training step across BOTH processes' devices
mesh = meshlib.make_mesh(spatial=1)
model = DeepLabv3plus(n_classes=3, dtype=jnp.float32)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 16)), train=False)
tx = build_optimizer("Adam", 1e-3)
state = create_train_state(model, variables, tx)
state = jax.device_put(state, meshlib.replicated(mesh))
step_fn = make_train_step(model, tx, list(class_weights()), mesh)

rng = np.random.RandomState(proc_id)
local = jnp.asarray(rng.rand(2, 32, 48, 16).astype(np.float32))
local_y = jnp.asarray(rng.randint(0, 3, size=(2, 32, 48)).astype(np.int32))
x = multihost_utils.host_local_array_to_global_array(
    local, mesh, jax.sharding.PartitionSpec("data"))
y = multihost_utils.host_local_array_to_global_array(
    local_y, mesh, jax.sharding.PartitionSpec("data"))
state, metrics = step_fn(state, x, y)
loss = float(metrics["loss"])
assert np.isfinite(loss)

# host-level collectives
total = allreduce_sum_scalar(float(proc_id + 1))
assert total == sum(range(1, nprocs + 1)), total
val = broadcast_from_host0(np.asarray([proc_id * 100 + 7]))
assert int(val[0]) == 7  # process 0's value everywhere

# process-0-only checkpoint write
from deepcam_tpu.ckpt.checkpoint import save_checkpoint
ck = os.path.join(outdir, "mh.cpt")
save_checkpoint(ck, state, epoch=0)
multihost_utils.sync_global_devices("ckpt")
assert os.path.exists(ck)

print(json.dumps({"proc": proc_id, "loss": loss, "devices": jax.device_count()}))
"""


SPATIAL_WORKER = r"""
import os, sys, json
proc_id = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs, process_id=proc_id,
)
sys.path.insert(0, os.getcwd())
import numpy as np
import jax.numpy as jnp
from deepcam_tpu.core import mesh as meshlib
from deepcam_tpu.models import layers as layerlib
from deepcam_tpu.models.deeplab import DeepLabv3plus
from deepcam_tpu.parallel.gspmd import make_eval_step_gspmd, make_train_step_gspmd
from deepcam_tpu.train.losses import class_weights
from deepcam_tpu.train.optim import build_optimizer
from deepcam_tpu.train.trainer import create_train_state

# data(2) x spatial(2): each process holds ONE data replica whose 2-way
# H-sharded spatial group lives on its own 2 local devices (ICI-local halos,
# cli/train.py --spatial semantics)
layerlib.set_sepconv_impl("xla")  # Pallas custom-calls are SPMD-opaque
mesh = meshlib.make_mesh(spatial=2)
assert mesh.shape == {"data": 2, "spatial": 2}
model = DeepLabv3plus(n_classes=3, dtype=jnp.float32)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 16)),
                       train=False)
tx = build_optimizer("Adam", 1e-3)
state = create_train_state(model, variables, tx)
state = jax.device_put(state, meshlib.replicated(mesh))
step_fn = make_train_step_gspmd(model, tx, list(class_weights()), mesh)
eval_fn = make_eval_step_gspmd(model, list(class_weights()), mesh)

# deterministic GLOBAL batch; each process feeds its sample (rank slice)
rng = np.random.RandomState(0)
gx = rng.rand(2, 32, 48, 16).astype(np.float32)
gy = rng.randint(0, 3, size=(2, 32, 48)).astype(np.int32)
sh = meshlib.batch_sharding(mesh)
x = meshlib.put_global(gx[proc_id:proc_id + 1], sh)
y = meshlib.put_global(gy[proc_id:proc_id + 1], sh)
from jax.sharding import NamedSharding, PartitionSpec as P
valid = meshlib.put_global(np.ones((1,), np.float32),
                           NamedSharding(mesh, P("data")))
c, ls, isum = eval_fn(state, x, y, valid)

state2, metrics = step_fn(state, x, y)  # donates state — eval ran first
loss = float(metrics["loss"])
print(json.dumps({"proc": proc_id, "loss": loss,
                  "eval_count": float(c), "eval_loss": float(ls)}))
"""


@pytest.mark.slow
def test_two_process_spatial_gspmd_step(tmp_path):
    """The --spatial GSPMD data x spatial step across 2 processes: train +
    eval numerics must equal a single-process 4-device run of the same
    global batch (the pod path the CLI takes for --spatial > 1)."""
    import json

    import numpy as np

    worker = tmp_path / "spatial_worker.py"
    worker.write_text(SPATIAL_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", "29513"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=480)
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"spatial worker failed:\n{err[-3000:]}"
    results = [json.loads(out.strip().splitlines()[-1]) for _, out, _ in outs]
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-6

    # single-process reference on 4 of the conftest's 8 CPU devices
    import jax
    import jax.numpy as jnp

    from deepcam_tpu.core import mesh as meshlib
    from deepcam_tpu.models import layers as layerlib
    from deepcam_tpu.models.deeplab import DeepLabv3plus
    from deepcam_tpu.parallel.gspmd import make_train_step_gspmd
    from deepcam_tpu.train.losses import class_weights
    from deepcam_tpu.train.optim import build_optimizer
    from deepcam_tpu.train.trainer import create_train_state

    layerlib.set_sepconv_impl("xla")
    try:
        mesh = meshlib.make_mesh(spatial=2, devices=jax.devices()[:4])
        model = DeepLabv3plus(n_classes=3, dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 16)), train=False)
        tx = build_optimizer("Adam", 1e-3)
        state = create_train_state(model, variables, tx)
        state = jax.device_put(state, meshlib.replicated(mesh))
        step_fn = make_train_step_gspmd(model, tx, list(class_weights()), mesh)
        rng = np.random.RandomState(0)
        gx = rng.rand(2, 32, 48, 16).astype(np.float32)
        gy = rng.randint(0, 3, size=(2, 32, 48)).astype(np.int32)
        sh = meshlib.batch_sharding(mesh)
        _, metrics = step_fn(state, jax.device_put(gx, sh),
                             jax.device_put(gy, sh))
        ref_loss = float(metrics["loss"])
    finally:
        layerlib.set_sepconv_impl("auto")
    assert abs(results[0]["loss"] - ref_loss) < 1e-5, (results, ref_loss)


CLI_WORKER = r"""
import os, sys, json
proc_id = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
root = sys.argv[4]; outdir = sys.argv[5]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs, process_id=proc_id,
)
sys.path.insert(0, os.getcwd())
from deepcam_tpu.cli.train import build_parser, main
res = main(build_parser().parse_args([
    "--data_dir_prefix", root, "--output_dir", outdir,
    "--run_tag", "mh4", "--local_batch_size", "1", "--max_epochs", "1",
    "--logging_frequency", "1", "--validation_frequency", "1",
    "--save_frequency", "0", "--amp_opt_level", "O0",
    "--target_iou", "2.0", "--eval_local_batch_size", "1",
]))
print(json.dumps({"proc": proc_id, "step": res["step"],
                  "eval_seen": res["eval_samples_seen"],
                  "eval_iou": res["eval_iou"]}))
"""


@pytest.mark.slow
def test_four_process_cli_uneven_validation(tmp_path):
    """FULL CLI across 4 processes x 2 devices with an UNEVEN validation
    split (10 samples over 4 hosts → shards [2,2,2,4]; the last rank
    absorbs the remainder).  The hosts therefore see different per-host
    batch counts — the eval loop must pad the smaller hosts with valid=0
    batches or the in-step psums deadlock the pod.  Every sample must be
    counted exactly once (eval_samples_seen == 10 on every process)."""
    import json

    from deepcam_tpu.data.synthetic import make_synthetic_dataset

    root = make_synthetic_dataset(
        str(tmp_path / "data"), n_train=8, n_validation=10, shape=(32, 48)
    )
    worker = tmp_path / "cli_worker.py"
    worker.write_text(CLI_WORKER)
    outdir = str(tmp_path / "out")
    os.makedirs(outdir, exist_ok=True)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "4", "29517", root,
             outdir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(4)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"cli worker failed:\n{err[-3000:]}"
    results = [json.loads(out.strip().splitlines()[-1])
               for _, out, _ in outs]
    assert {r["proc"] for r in results} == {0, 1, 2, 3}
    for r in results:
        # 8 train files / (1 x 8 devices) = 1 step; all 10 validation
        # samples counted exactly once despite the uneven shards
        assert r["step"] == 1, results
        assert r["eval_seen"] == 10.0, results
        assert 0.0 <= r["eval_iou"] <= 1.0


@pytest.mark.slow
def test_two_process_training_step(tmp_path):
    from deepcam_tpu.data.synthetic import make_synthetic_dataset

    root = make_synthetic_dataset(
        str(tmp_path / "data"), n_train=8, n_validation=2, shape=(32, 48)
    )
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = "29511"
    outdir = str(tmp_path)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", port, root, outdir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=480)
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-3000:]}"
    import json

    results = [json.loads(out.strip().splitlines()[-1]) for _, out, _ in outs]
    assert {r["proc"] for r in results} == {0, 1}
    assert all(r["devices"] == 4 for r in results)
    # replicated state + global psum => both processes see the same loss
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-6
