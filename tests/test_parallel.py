"""Data-parallel correctness: the sharded step equals the single-device
step (global-batch negative semantics, SURVEY.md §2.2)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmt_tpu.models.cenet import CENet, similarity_from_outputs
from mmt_tpu.parallel import mesh as mesh_lib
from mmt_tpu.train.losses import max_margin_ranking_loss
from tests.conftest import make_batch


def _run_worker_pair(worker, envs_for_port, repo, timeout, what="worker",
                     on_retry=None):
  """Launch the 2-process worker pair; retry ONCE on the Gloo
  rendezvous DEADLINE flake.

  XLA's gloo kv-store GetKeyValue carries a hardcoded ~30 s timeout with
  no config knob; on a loaded single-core machine one process can be
  descheduled past it during gloo context creation (which happens at the
  first cross-process collective, before any training state is written),
  killing the run with "Gloo context initialization failed ...
  DEADLINE_EXCEEDED".  That is launch-environment flakiness, not a
  framework bug, so it earns exactly one retry (on a fresh coordinator
  port); any other failure — and a second gloo failure — fails fast.
  """
  import socket
  import subprocess
  import sys

  for attempt in (0, 1):
    with socket.socket() as s:
      s.bind(("localhost", 0))
      port = s.getsockname()[1]
    procs = [subprocess.Popen([sys.executable, worker], env=env, cwd=repo,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for env in envs_for_port(port)]
    try:
      outs = [p.communicate(timeout=timeout)[0] for p in procs]
    except subprocess.TimeoutExpired:
      # A hang must not leak two CPU-bound workers into the rest of the
      # suite on this single-core machine.
      for p in procs:
        p.kill()
      for p in procs:
        p.communicate()
      raise
    rcs = [p.returncode for p in procs]
    if all(rc == 0 for rc in rcs):
      return outs
    # Retry ONLY when every failing process shows the Gloo signature: a
    # real crash in one worker typically cascades into a Gloo DEADLINE
    # in its peer, and retrying that would bury the true diagnostics.
    gloo_flake = all("Gloo context initialization failed" in out
                     for rc, out in zip(rcs, outs) if rc != 0)
    if attempt == 0 and gloo_flake:
      for i, (rc, out) in enumerate(zip(rcs, outs)):
        if rc != 0:
          print(f"[{what} attempt 0, proc {i} rc={rc}] tail:\n"
                f"{out[-1500:]}", file=sys.stderr)
      if on_retry is not None:
        on_retry()
      continue
    fails = "\n".join(f"proc {i} rc={rc}:\n{out[-4000:]}"
                      for i, (rc, out) in enumerate(zip(rcs, outs))
                      if rc != 0)
    raise AssertionError(f"{what} failed:\n{fails}")


def test_data_mesh_shapes():
  m = mesh_lib.data_mesh()
  assert m is not None and m.devices.shape == (8, 1)
  m2 = mesh_lib.data_mesh(model_parallel=2)
  assert m2.devices.shape == (4, 2)


def test_sharded_step_matches_single_device(tiny_arch):
  """Loss and grads on an 8-way sharded batch == unsharded computation.

  This is the invariant the reference enforces by hand (DataParallel
  out='embds' + host-side loss re-fusion, trainer/trainer.py:185-199);
  here GSPMD owns it — similarity over the full batch forces embedding
  all-gathers, differentiably."""
  model = CENet(**tiny_arch)
  batch = make_batch(tiny_arch["expert_dims"], b=16)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  loss_fn = max_margin_ranking_loss(0.05, True)

  def compute(params, batch):
    out = model.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      batch, train=False)
    return loss_fn(similarity_from_outputs(out, merge="avg"))

  grad_fn = jax.value_and_grad(compute)

  # Single device
  loss_1, grads_1 = jax.jit(grad_fn)(variables["params"], batch)

  # 8-way data sharding
  mesh = mesh_lib.data_mesh()
  shard = NamedSharding(mesh, P("data"))
  sharded_batch = jax.tree_util.tree_map(
      lambda x: jax.device_put(x, shard), batch)
  loss_8, grads_8 = jax.jit(grad_fn, in_shardings=(None, shard))(
      variables["params"], sharded_batch)

  np.testing.assert_allclose(float(loss_1), float(loss_8), rtol=1e-5)
  flat_1 = jax.tree_util.tree_leaves(grads_1)
  flat_8 = jax.tree_util.tree_leaves(grads_8)
  for a, b in zip(flat_1, flat_8):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=1e-5)


def test_sharded_train_step_runs_and_updates(tiny_arch):
  """Full optimizer step under the mesh changes params and stays finite."""
  from mmt_tpu.train.optim import build_optimizer

  model = CENet(**tiny_arch)
  batch = make_batch(tiny_arch["expert_dims"], b=8)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  tx, _ = build_optimizer({"type": "Adam", "args": {"lr": 1e-3,
                                                    "weight_decay": 0}})
  params = variables["params"]
  opt_state = tx.init(params)
  loss_fn = max_margin_ranking_loss(0.05, True)

  mesh = mesh_lib.data_mesh()
  shard = NamedSharding(mesh, P("data"))

  def step(params, opt_state, batch, rng):
    def compute(p):
      out, _ = model.apply(
          {"params": p, "batch_stats": variables["batch_stats"]}, batch,
          train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
      return loss_fn(similarity_from_outputs(out, merge="avg"))
    loss, grads = jax.value_and_grad(compute)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss

  jit_step = jax.jit(step, in_shardings=(None, None, shard, None))
  sharded = jax.tree_util.tree_map(lambda x: jax.device_put(x, shard), batch)
  new_params, opt_state, loss = jit_step(params, opt_state, sharded,
                                         jax.random.PRNGKey(3))
  assert np.isfinite(float(loss))
  moved = sum(float(jnp.sum(jnp.abs(a - b)))
              for a, b in zip(jax.tree_util.tree_leaves(params),
                              jax.tree_util.tree_leaves(new_params)))
  assert moved > 0


def test_dryrun_multichip_entrypoint():
  import __graft_entry__
  __graft_entry__.dryrun_multichip(8)


def test_two_process_distributed_matches_single_process(tmp_path):
  """maybe_initialize_distributed: 2 local processes x 4 virtual CPU
  devices run one DP train step over the global 8-device mesh; loss and
  post-update params must match the identical single-process program
  (DESIGN.md multi-host claim, mesh.py:32-55)."""
  import os
  import re
  import subprocess
  import sys

  worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
  repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))

  def env_for(n_local, proc_id=None, n_procs=None, port=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_local}")
    env["XLA_FLAGS"] = " ".join(flags)
    if proc_id is not None:
      env["MMT_TPU_COORDINATOR"] = f"localhost:{port}"
      env["MMT_TPU_NUM_PROCESSES"] = str(n_procs)
      env["MMT_TPU_PROCESS_ID"] = str(proc_id)
    else:
      env.pop("MMT_TPU_COORDINATOR", None)
    return env

  def parse(out):
    m = re.search(r"RESULT loss=([\d.]+) n_devices=(\d+) "
                  r"fingerprint=([\d.]+)", out)
    assert m, f"worker produced no RESULT line:\n{out[-3000:]}"
    return float(m.group(1)), int(m.group(2)), float(m.group(3))

  outs = _run_worker_pair(
      worker, lambda port: [env_for(4, i, 2, port=port) for i in range(2)],
      repo, timeout=900)

  single = subprocess.run([sys.executable, worker], env=env_for(8),
                          cwd=repo, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True, timeout=900)
  assert single.returncode == 0, single.stdout[-3000:]

  loss0, n0, fp0 = parse(outs[0])
  loss1, n1, fp1 = parse(outs[1])
  loss_s, n_s, fp_s = parse(single.stdout)
  assert n0 == n1 == n_s == 8
  assert loss0 == loss1 and fp0 == fp1, "processes disagree"
  np.testing.assert_allclose(loss0, loss_s, rtol=1e-6)
  np.testing.assert_allclose(fp0, fp_s, rtol=1e-6)


def test_two_process_full_trainer_matches_single_process(tmp_path):
  """Multi-host as a SYSTEM: two processes run the full CLI trainer
  (Trainer.train() 2 epochs + evaluate(), checkpoints, artifacts) over
  the global 8-device mesh and must produce the same trained params,
  the same final-eval metrics, and exactly one set of artifacts (gated
  on process 0) as the identical single-process run."""
  import json
  import os
  import re
  import subprocess
  import sys

  from mmt_tpu.data import synthetic
  from mmt_tpu.train import checkpoint as ckpt_lib

  worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
  repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))

  root = tmp_path / "corpus"
  root.mkdir()
  data_dir = synthetic.generate(root, num_videos=14, num_test=6,
                                experts={"rgb": 2048, "s3d": 1024},
                                captions_per_video=3)

  def env_for(n_local, exp_dir, proc_id=None, n_procs=None, port=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_local}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["MMT_TPU_WORKER_MODE"] = "full_train"
    env["MMT_TPU_WORKER_ROOT"] = str(root)
    env["MMT_TPU_WORKER_DATA"] = str(data_dir)
    env["MMT_TPU_WORKER_EXP"] = str(exp_dir)
    # Continuous eval runs the candidate-sharded fused no-matrix path
    # across the real 2-process mesh (final_eval still materializes the
    # matrix, so both eval programs are covered by this e2e).
    env["MMT_TPU_WORKER_FUSED_EVAL"] = "1"
    if proc_id is not None:
      env["MMT_TPU_COORDINATOR"] = f"localhost:{port}"
      env["MMT_TPU_NUM_PROCESSES"] = str(n_procs)
      env["MMT_TPU_PROCESS_ID"] = str(proc_id)
    else:
      env.pop("MMT_TPU_COORDINATOR", None)
    return env

  def parse(out):
    m = re.search(r"RESULTFULL fingerprint=([\d.]+) n_devices=(\d+) "
                  r"perfs=(\{.*\})", out)
    assert m, f"worker produced no RESULTFULL line:\n{out[-3000:]}"
    return float(m.group(1)), int(m.group(2)), json.loads(m.group(3))

  exp2 = tmp_path / "exp_2proc"

  def _clean_exp2():
    # A gloo-init failure can strike only at the first collective, i.e.
    # before any checkpoint write — but construction-time artifacts
    # (config.json, logs, TB dirs) may exist; start the retry clean.
    import shutil
    if exp2.exists():
      shutil.rmtree(exp2)

  outs = _run_worker_pair(
      worker, lambda port: [env_for(4, exp2, i, 2, port=port)
                            for i in range(2)],
      repo, timeout=1800, on_retry=_clean_exp2)

  exp1 = tmp_path / "exp_single"
  single = subprocess.run([sys.executable, worker],
                          env=env_for(8, exp1), cwd=repo,
                          stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True, timeout=1800)
  assert single.returncode == 0, single.stdout[-4000:]

  fp0, n0, perfs0 = parse(outs[0])
  fp1, n1, perfs1 = parse(outs[1])
  fp_s, n_s, perfs_s = parse(single.stdout)
  assert n0 == n1 == n_s == 8
  # Processes agree with each other (lockstep), and with single-process.
  np.testing.assert_allclose(fp0, fp1, rtol=1e-8)
  np.testing.assert_allclose(fp0, fp_s, rtol=1e-5)
  assert perfs0 == perfs1, "both processes must read the same results"

  def flat(perfs):
    return {f"{ds}/{k}": v for ds, d in perfs.items() for k, v in d.items()}

  f2, f1 = flat(perfs0), flat(perfs_s)
  assert set(f2) == set(f1) and f2, "metric key sets differ (or empty)"
  for key in f1:
    np.testing.assert_allclose(f2[key], f1[key], rtol=1e-4, atol=1e-6,
                               err_msg=key)

  # Written state matches across topologies.  Degenerate-gradient leaves
  # are compared separately: the attention key bias (softmax shift
  # invariance) and a Dense bias feeding BatchNorm (mean subtraction)
  # have mathematically ZERO gradient, so Adam normalizes their
  # numerical-noise gradients into ±lr-scale random walks — and the
  # noise differs between gloo and intra-process collectives.  Two
  # independent walks over 4 steps at lr=1e-3 can differ by up to
  # ~8e-3, so a tight global atol is a coin flip (one element of 48 hit
  # 1.03e-3 once); they get the walk-scale bound BY NAME and everything
  # else stays tight.
  s2 = ckpt_lib.load_checkpoint_raw(exp2 / "trained_model.msgpack")
  s1 = ckpt_lib.load_checkpoint_raw(exp1 / "trained_model.msgpack")

  def degenerate_bias_paths(params):
    """Paths of zero-gradient biases: */key/bias (attention keys) and
    */fc/bias where a sibling BatchNorm consumes fc's output
    (components.py ContextGating/ContextGatingReasoning)."""
    out = set()
    def walk(node, path):
      if not isinstance(node, dict):
        return
      for k, v in node.items():
        walk(v, path + (k,))
      if "key" in node and isinstance(node["key"], dict) \
         and "bias" in node["key"]:
        out.add(path + ("key", "bias"))
      if "fc" in node and isinstance(node["fc"], dict) \
         and "bias" in node["fc"] \
         and ("batch_norm" in node or "batch_norm2" in node):
        out.add(path + ("fc", "bias"))
    walk(params, ())
    return out

  degen = degenerate_bias_paths(s1["params"])
  assert degen, "expected degenerate leaves in this architecture"

  def flat_with_paths(params):
    out = {}
    def walk(node, path):
      if isinstance(node, dict):
        for k, v in node.items():
          walk(v, path + (k,))
      else:
        out[path] = np.asarray(node)
    walk(params, ())
    return out

  p2, p1 = flat_with_paths(s2["params"]), flat_with_paths(s1["params"])
  assert set(p2) == set(p1) and p1
  n_walked = 0
  for path in sorted(p1):
    if path in degen:
      np.testing.assert_allclose(p2[path], p1[path], rtol=0, atol=1e-2,
                                 err_msg=f"degenerate {'/'.join(path)}")
      n_walked += 1
    else:
      # atol=1e-3 still covers SOFT invariances (e.g. an embedding-table
      # row's all-ones component, which the embeddings LayerNorm removes
      # — a 1-D noise walk spread over sqrt(H) elements).
      np.testing.assert_allclose(p2[path], p1[path], rtol=2e-4, atol=1e-3,
                                 err_msg="/".join(path))
  assert n_walked == len(degen)

  # Single-writer invariant: artifacts exist once, from process 0.
  for fname in ("exp_results.json", "exp_completed_flag.txt",
                "trained_model.msgpack", "MSRVTT-test-sims.npy",
                "perf_log.txt", "config.json"):
    assert (exp2 / fname).exists(), fname
  # Secondary process logged to its own file, not process 0's log.
  assert (exp2 / "log.p1.txt").exists()

  # Restart leg: bump epochs in the dumped config and --resume across 2
  # processes — every process reads the shared checkpoint, counters
  # restore, one more epoch trains, and a newer checkpoint appears.
  cfg = json.loads((exp2 / "config.json").read_text())
  cfg["trainer"]["epochs"] = 3
  (exp2 / "config.json").write_text(json.dumps(cfg))
  def renvs(port):
    out = []
    for pid in range(2):
      env = env_for(4, exp2, pid, 2, port=port)
      env["MMT_TPU_WORKER_RESUME"] = "1"
      out.append(env)
    return out

  # A gloo-init failure precedes any write, so the resume leg must keep
  # exp2's existing checkpoints; on_retry ENFORCES that assumption — if
  # one process somehow completed (writing checkpoint-epoch3) while its
  # peer failed Gloo init, a retry would resume from the already-advanced
  # state and the epoch==3 asserts below would pass vacuously.
  def no_partial_progress():
    assert not (exp2 / "checkpoint-epoch3.msgpack").exists(), (
        "gloo retry requested but the resume leg already wrote "
        "checkpoint-epoch3 — a retry would not exercise a real resume")

  outs = _run_worker_pair(worker, renvs, repo, timeout=1800,
                          what="resume worker", on_retry=no_partial_progress)
  fr0, _, rperfs0 = parse(outs[0])
  fr1, _, rperfs1 = parse(outs[1])
  np.testing.assert_allclose(fr0, fr1, rtol=1e-8)
  assert rperfs0 == rperfs1
  s3 = ckpt_lib.load_checkpoint_raw(exp2 / "checkpoint-epoch3.msgpack")
  assert int(s3["epoch"]) == 3


def test_trainer_runs_pallas_kernels_under_mesh(tiny_train_setup=None):
  """A Trainer with an active >1-device mesh keeps BOTH Pallas kernel
  families enabled: the FFN kernels and the similarity kernel all carry
  custom_partitioning rules (ops/ffn.py:_tp_row_sharded,
  ops/similarity.py:_qv_sharded), so the sharded train step runs them
  partitioned instead of forcing the XLA path."""
  from mmt_tpu.ops import ffn
  from mmt_tpu.ops import similarity

  ffn.use_pallas(True, interpret=True)
  similarity.use_pallas(True, interpret=True)
  try:
    import json, pathlib, sys, tempfile, os
    sys.path.insert(0, "tests")
    from mmt_tpu.data import synthetic
    from test_train_e2e import make_config
    import train as train_cli

    root = pathlib.Path(tempfile.mkdtemp())
    data_dir = synthetic.generate(root, num_videos=10, num_test=4,
                                  experts={"rgb": 2048, "s3d": 1024},
                                  captions_per_video=1)
    os.environ["MMT_TPU_BERT_VOCAB"] = str(root / "vocab.txt")
    cfg = make_config(root, data_dir, root / "exps")
    cfg["train_sets"][0]["args"]["batch_size"] = 8   # divisible by 8 devices
    cfg["trainer"].update({"epochs": 1, "max_samples_per_epoch": 8})
    cfg_path = root / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    trainer = train_cli.main(["--config", str(cfg_path)])
    assert trainer.mesh is not None, "expected the 8-device mesh active"
    assert ffn.pallas_active(), "row-partitioned FFN kernels stay on"
    assert similarity.pallas_active(), "partitioned similarity stays on"
  finally:
    ffn.use_pallas(False)
    similarity.use_pallas(False)


def test_similarity_kernel_partitions_both_ways():
  """The Pallas similarity kernel's custom_partitioning rule
  (ops/similarity.py:_qv_sharded) under the 8-device mesh:

  * trainer case — both sides sharded on the same 'data' axis: values
    match the unsharded kernel and the output is caption-row-sharded
    (the video side all-gathers: global-batch negatives);
  * serving case — video operands sharded, captions replicated: values
    match and the output stays sharded on the VIDEO axis (the index is
    never gathered);
  * grads of a sharded loss through the custom_vjp match unsharded.
  """
  from mmt_tpu.ops import similarity

  rng = np.random.RandomState(0)
  q, v, m, d = 16, 24, 3, 32
  t = rng.randn(q, m, d).astype(np.float32)
  vv = rng.randn(v, m, d).astype(np.float32)
  tw = np.abs(rng.randn(q, m)).astype(np.float32)
  vw = np.abs(rng.randn(v, m)).astype(np.float32)

  similarity.use_pallas(True, interpret=True)
  try:
    fused = similarity._fused_moe_similarity
    want = np.asarray(jax.jit(fused)(t, vv, tw, vw))

    mesh = mesh_lib.data_mesh()
    row3 = NamedSharding(mesh, P("data", None, None))
    row2 = NamedSharding(mesh, P("data", None))
    rep = NamedSharding(mesh, P())

    # Trainer case: everything batch-sharded on 'data'.
    got = jax.jit(fused, in_shardings=(row3, row3, row2, row2))(
        jax.device_put(t, row3), jax.device_put(vv, row3),
        jax.device_put(tw, row2), jax.device_put(vw, row2))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    # The same-axis conflict resolves to ONE sharded output dim (which
    # one is the propagator's choice); it must not fall back to fully
    # replicated (= the kernel replicated + both operands gathered).
    assert "data" in tuple(got.sharding.spec), got.sharding

    # Serving case: index sharded on the video axis, queries replicated.
    got2 = jax.jit(fused, in_shardings=(rep, row3, rep, row2))(
        jax.device_put(t, rep), jax.device_put(vv, row3),
        jax.device_put(tw, rep), jax.device_put(vw, row2))
    np.testing.assert_allclose(np.asarray(got2), want, rtol=1e-5, atol=1e-5)
    spec = got2.sharding.spec
    assert len(spec) == 2 and spec[1] == "data", got2.sharding

    # Gradients through the custom_vjp under the trainer sharding.
    def loss(t, vv, tw, vw):
      return jnp.sum(fused(t, vv, tw, vw) ** 2)

    g1 = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(t, vv, tw, vw)
    g8 = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)),
                 in_shardings=(row3, row3, row2, row2))(
        jax.device_put(t, row3), jax.device_put(vv, row3),
        jax.device_put(tw, row2), jax.device_put(vw, row2))
    for a, b in zip(g1, g8):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 rtol=1e-4, atol=1e-5)
  finally:
    similarity.use_pallas(False)


def test_sharded_batchnorm_stats_match_single_device(tiny_arch):
  """txt_pro='gbn' mutates BatchNorm batch_stats inside the train step;
  under the 8-way data mesh the statistics must be GLOBAL-batch moments
  (matching the reference's single-process BatchNorm1d,
  model/model.py:743) — GSPMD turns the batch-axis mean/var reductions
  into cross-device psums, so the updated running stats must equal the
  unsharded step's bit-for-bit up to collective reduction order."""
  model = CENet(**tiny_arch)
  assert model.txt_pro == "gbn", "test requires the BatchNorm-active path"
  batch = make_batch(tiny_arch["expert_dims"], b=16)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  params, bstats = variables["params"], variables["batch_stats"]
  assert jax.tree_util.tree_leaves(bstats), "expected live batch stats"

  def step(params, bstats, batch):
    out, mut = model.apply(
        {"params": params, "batch_stats": bstats}, batch, train=True,
        rngs={"dropout": jax.random.PRNGKey(7)}, mutable=["batch_stats"])
    sims = similarity_from_outputs(out, merge="avg")
    return jnp.sum(sims), mut["batch_stats"]

  loss1, bs1 = jax.jit(step)(params, bstats, batch)

  mesh = mesh_lib.data_mesh()
  shard = NamedSharding(mesh, P("data"))
  sharded = jax.tree_util.tree_map(lambda x: jax.device_put(x, shard), batch)
  loss8, bs8 = jax.jit(step, in_shardings=(None, None, shard))(
      params, bstats, sharded)

  np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
  flat1, tree1 = jax.tree_util.tree_flatten(bs1)
  flat8, tree8 = jax.tree_util.tree_flatten(bs8)
  flat0, _ = jax.tree_util.tree_flatten(bstats)
  assert tree1 == tree8
  moved = 0.0
  for a, b, init in zip(flat1, flat8, flat0):
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-6)
    moved += float(jnp.sum(jnp.abs(a - init)))
  assert moved > 0, "batch stats must actually update in a train step"


def test_ffn_kernel_partitions_on_rows():
  """The fused FFN Pallas kernels shard on the row axis under GSPMD
  (custom_partitioning rules in ops/ffn.py): with x sharded over the
  8-device data mesh, output values match the unsharded call and the
  output STAYS row-sharded (no replication / all-gather)."""
  from mmt_tpu.ops import ffn

  rng = np.random.RandomState(0)
  r, h, i = 128, 64, 256
  x = rng.randn(r, h).astype(np.float32)
  w1 = (rng.randn(h, i) * 0.05).astype(np.float32)
  b1 = np.zeros(i, np.float32)
  w2 = (rng.randn(i, h) * 0.05).astype(np.float32)
  b2 = np.zeros(h, np.float32)
  g = np.ones(h, np.float32)
  bb = np.zeros(h, np.float32)

  want = ffn.ffn_block(x, w1, b1, w2, b2, g, bb, eps=1e-12,
                       compute_dtype=jnp.float32, interpret=True)

  mesh = mesh_lib.data_mesh()
  shard = NamedSharding(mesh, P("data", None))
  xs = jax.device_put(x, shard)
  fn = jax.jit(lambda *a: ffn.ffn_block(*a, eps=1e-12,
                                        compute_dtype=jnp.float32,
                                        interpret=True))
  got = fn(xs, w1, b1, w2, b2, g, bb)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)
  assert got.sharding.spec[0] == "data", got.sharding

  # train-path fwd+bwd: grads of a sharded-batch loss match unsharded
  drop = (rng.rand(r, h) >= 0.2).astype(np.float32) / 0.8

  def loss(x, w1):
    out = ffn.ffn_block_train(x, drop, w1, b1, w2, b2, g, bb, eps=1e-12,
                              compute_dtype=jnp.float32, interpret=True)
    return jnp.sum(out ** 2)

  gx_1, gw_1 = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, w1)
  ds = jax.device_put(drop, shard)
  def loss_sharded(x, w1):
    out = ffn.ffn_block_train(x, ds, w1, b1, w2, b2, g, bb, eps=1e-12,
                              compute_dtype=jnp.float32, interpret=True)
    return jnp.sum(out ** 2)
  gx_8, gw_8 = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(xs, w1)
  np.testing.assert_allclose(np.asarray(gx_8), np.asarray(gx_1),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(gw_8), np.asarray(gw_1),
                             rtol=1e-4, atol=1e-5)


def test_fused_ranking_kernel_partitions_candidate_axis():
  """The fused-counts ranking op's custom_partitioning
  (ops/ranking.py:_cand_sharded) under the 8-device mesh:

  * at-scale eval case — CANDIDATE operands sharded, queries replicated:
    ranks match the unsharded kernel in both orientations and the
    outputs stay REPLICATED (the psum over candidate shards keeps
    multi-host lockstep);
  * query-sharded case — queries sharded, candidates replicated: ranks
    match and outputs stay query-sharded (no psum needed);
  * padded corpus — vid_valid biases pad candidates out exactly.
  """
  from mmt_tpu.ops import ranking

  rng = np.random.RandomState(0)
  v, cpv, m, d = 24, 2, 3, 32
  q = v * cpv
  te = rng.randn(q, m, d).astype(np.float32)
  ve = rng.randn(v, m, d).astype(np.float32)
  tw = np.abs(rng.randn(q, m)).astype(np.float32)
  vw = np.abs(rng.randn(v, m)).astype(np.float32)
  masks = (rng.rand(v, cpv) > 0.2).astype(np.float32)
  masks[:, 0] = 1.0   # every video keeps one live caption

  t2v = lambda *a, **k: ranking.fused_t2v_ranks(*a, interpret=True, **k)
  v2t = lambda *a, **k: ranking.fused_v2t_ranks(*a, interpret=True, **k)

  want_t2v = np.asarray(t2v(te, ve, tw, vw))
  want_v2t = np.asarray(v2t(te, ve, tw, vw, masks))

  mesh = mesh_lib.data_mesh()
  row3 = NamedSharding(mesh, P("data", None, None))
  row2 = NamedSharding(mesh, P("data", None))
  rep = NamedSharding(mesh, P())

  # At-scale eval: video candidates sharded, caption queries replicated.
  got = t2v(jax.device_put(te, rep), jax.device_put(ve, row3),
            jax.device_put(tw, rep), jax.device_put(vw, row2))
  np.testing.assert_allclose(np.asarray(got), want_t2v, atol=1e-5)
  assert all(a is None for a in tuple(got.sharding.spec)), got.sharding

  # v2t orientation: caption candidates sharded, video queries replicated.
  got2 = v2t(jax.device_put(te, row3), jax.device_put(ve, rep),
             jax.device_put(tw, row2), jax.device_put(vw, rep),
             jax.device_put(jnp.asarray(masks), rep))
  np.testing.assert_allclose(np.asarray(got2), want_v2t, atol=1e-5)
  assert all(a is None for a in tuple(got2.sharding.spec)), got2.sharding

  # Query-sharded: outputs ride the query sharding, candidates gather.
  got3 = t2v(jax.device_put(te, row3), jax.device_put(ve, rep),
             jax.device_put(tw, row2), jax.device_put(vw, rep))
  np.testing.assert_allclose(np.asarray(got3), want_t2v, atol=1e-5)
  assert "data" in tuple(got3.sharding.spec), got3.sharding

  # Padded corpus: 8 zero pad videos (divisible sharding), biased out via
  # vid_valid; the pad rows must change NO real query's rank.
  pad = 8
  ve_p = np.concatenate([ve, np.zeros((pad, m, d), np.float32)], 0)
  vw_p = np.concatenate([vw, np.zeros((pad, m), np.float32)], 0)
  te_p = np.concatenate([te, np.zeros((pad * cpv, m, d), np.float32)], 0)
  tw_p = np.concatenate([tw, np.zeros((pad * cpv, m), np.float32)], 0)
  valid = np.concatenate([np.ones(v, np.float32), np.zeros(pad, np.float32)])
  got4 = t2v(jax.device_put(te_p, rep),
             jax.device_put(ve_p, NamedSharding(mesh, P("data", None, None))),
             jax.device_put(tw_p, rep),
             jax.device_put(vw_p, NamedSharding(mesh, P("data", None))),
             jax.device_put(jnp.asarray(valid), NamedSharding(mesh, P("data"))))
  np.testing.assert_allclose(np.asarray(got4)[:q], want_t2v, atol=1e-5)

  # Multi-axis candidate sharding P(('data','model')) on a 4x2 mesh: the
  # partition rule linearizes the shard index over BOTH axes for the
  # GT-exclusion offset and psums over both — ranks must still match.
  mesh2 = mesh_lib.data_mesh(model_parallel=2)
  both3 = NamedSharding(mesh2, P(("data", "model"), None, None))
  both2 = NamedSharding(mesh2, P(("data", "model"), None))
  rep2 = NamedSharding(mesh2, P())
  got5 = t2v(jax.device_put(te, rep2), jax.device_put(ve, both3),
             jax.device_put(tw, rep2), jax.device_put(vw, both2))
  np.testing.assert_allclose(np.asarray(got5), want_t2v, atol=1e-5)
  assert all(a is None for a in tuple(got5.sharding.spec)), got5.sharding

  # Mixed partial overlap: queries on 'data', candidates on
  # ('data','model').  Only the CONFLICTING axis leaves the candidate
  # sharding — candidates stay sharded over 'model' (ranks and the
  # query-sharded outputs unchanged) instead of gathering the corpus.
  d_row3 = NamedSharding(mesh2, P("data", None, None))
  d_row2 = NamedSharding(mesh2, P("data", None))
  got6 = t2v(jax.device_put(te, d_row3), jax.device_put(ve, both3),
             jax.device_put(tw, d_row2), jax.device_put(vw, both2))
  np.testing.assert_allclose(np.asarray(got6), want_t2v, atol=1e-5)
  assert "data" in tuple(got6.sharding.spec) or any(
      isinstance(a, tuple) and "data" in a for a in tuple(got6.sharding.spec)
  ), got6.sharding


def test_ffn_kernel_tensor_parallel_eval():
  """The fused eval FFN kernel composes with tensor parallelism (round-4
  VERDICT item 1): with w1/w2 Megatron-sharded on a 4x2 mesh's 'model'
  axis (parallel/mesh.py:param_shardings layout), the partition rule
  (ops/ffn.py:_tp_row_sharded) runs the shard-local half kernel and
  psums the partial — values match the unsharded kernel and the
  compiled HLO contains NO all-gather (the weights stay sharded)."""
  from mmt_tpu.ops import ffn

  rng = np.random.RandomState(0)
  r, h, i = 16, 32, 64
  x = rng.randn(r, h).astype(np.float32)
  w1 = (rng.randn(h, i) * 0.05).astype(np.float32)
  b1 = rng.randn(i).astype(np.float32)
  w2 = (rng.randn(i, h) * 0.05).astype(np.float32)
  b2 = rng.randn(h).astype(np.float32)
  gamma = np.ones(h, np.float32)
  beta = np.zeros(h, np.float32)

  ffn.use_pallas(True, interpret=True)
  try:
    fn = lambda *a: ffn.ffn_block(*a, eps=1e-12, compute_dtype=jnp.float32)
    want = np.asarray(jax.jit(fn)(x, w1, b1, w2, b2, gamma, beta))

    mesh = mesh_lib.data_mesh(model_parallel=2)   # 4x2 (data, model)
    row = NamedSharding(mesh, P("data", None))
    col = NamedSharding(mesh, P(None, "model"))
    rowp = NamedSharding(mesh, P("model", None))
    vec = NamedSharding(mesh, P("model"))
    rep = NamedSharding(mesh, P())
    args = (jax.device_put(x, row), jax.device_put(w1, col),
            jax.device_put(b1, vec), jax.device_put(w2, rowp),
            jax.device_put(b2, rep), jax.device_put(gamma, rep),
            jax.device_put(beta, rep))
    got = jax.jit(fn)(*args)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    assert "data" in tuple(got.sharding.spec), got.sharding

    hlo = jax.jit(fn).lower(*args).compile().as_text()
    assert "all-gather" not in hlo, "TP FFN must not gather its weights"
    assert "all-reduce" in hlo, "expected the psum of the partial output"
  finally:
    ffn.use_pallas(False)


def test_ffn_train_kernel_tensor_parallel_grads():
  """The fused train-time FFN kernel (fused fwd+bwd, explicit dropout
  mask) under tensor parallelism: grads of a loss through
  ffn_block_train with model-sharded weights match jax.grad of the XLA
  reference, weight grads land on the SAME Megatron sharding as the
  weights (the optimizer update stays sharded), and the compiled grad
  program contains no all-gather."""
  from mmt_tpu.ops import ffn

  rng = np.random.RandomState(1)
  r, h, i = 16, 32, 64
  x = rng.randn(r, h).astype(np.float32)
  keep = (rng.rand(r, h) > 0.1).astype(np.float32) / 0.9
  w1 = (rng.randn(h, i) * 0.05).astype(np.float32)
  b1 = rng.randn(i).astype(np.float32)
  w2 = (rng.randn(i, h) * 0.05).astype(np.float32)
  b2 = rng.randn(h).astype(np.float32)
  gamma = np.ones(h, np.float32)
  beta = np.zeros(h, np.float32)

  ffn.use_pallas(True, interpret=True)
  try:
    def loss_fused(x, drop, w1, b1, w2, b2, g, bt):
      out = ffn.ffn_block_train(x, drop, w1, b1, w2, b2, g, bt,
                                eps=1e-12, compute_dtype=jnp.float32)
      return jnp.sum(out ** 2)

    def loss_ref(x, drop, w1, b1, w2, b2, g, bt):
      out = ffn.xla_ffn_block_train(x, drop, w1, b1, w2, b2, g, bt,
                                    eps=1e-12, compute_dtype=jnp.float32)
      return jnp.sum(out ** 2)

    grad_args = (0, 2, 3, 4, 5, 6, 7)
    want = jax.jit(jax.grad(loss_ref, argnums=grad_args))(
        x, keep, w1, b1, w2, b2, gamma, beta)

    mesh = mesh_lib.data_mesh(model_parallel=2)
    row = NamedSharding(mesh, P("data", None))
    col = NamedSharding(mesh, P(None, "model"))
    rowp = NamedSharding(mesh, P("model", None))
    vec = NamedSharding(mesh, P("model"))
    rep = NamedSharding(mesh, P())
    args = (jax.device_put(x, row), jax.device_put(keep, row),
            jax.device_put(w1, col), jax.device_put(b1, vec),
            jax.device_put(w2, rowp), jax.device_put(b2, rep),
            jax.device_put(gamma, rep), jax.device_put(beta, rep))
    grad_fn = jax.jit(jax.grad(loss_fused, argnums=grad_args))
    got = grad_fn(*args)
    names = ("dx", "dw1", "db1", "dw2", "db2", "dgamma", "dbeta")
    for n, a, b in zip(names, got, want):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 rtol=2e-4, atol=2e-5, err_msg=n)
    # Weight grads keep the Megatron layout — no reshard before Adam.
    assert tuple(got[1].sharding.spec) == (None, "model"), got[1].sharding
    assert tuple(got[3].sharding.spec)[0] == "model", got[3].sharding

    hlo = grad_fn.lower(*args).compile().as_text()
    assert "all-gather" not in hlo, "TP train FFN must not gather weights"
  finally:
    ffn.use_pallas(False)


def test_similarity_kernel_tuple_axis_sharding():
  """_qv_sharded normalizes TUPLE PartitionSpec entries (round-4 VERDICT
  #6, same convention as ops/ranking.py:_cand_sharded):

  * queries sharded over a tuple axis P(('data','model')) on a 4x2 mesh
    — values match unsharded and the output keeps a sharded dim;
  * mixed partial overlap (q on 'data', v on ('data','model')) — only
    the conflicting 'data' axis leaves the video side, so the index
    stays sharded over 'model' rather than gathering.
  """
  from mmt_tpu.ops import similarity

  rng = np.random.RandomState(2)
  q, v, m, d = 16, 24, 3, 32
  t = rng.randn(q, m, d).astype(np.float32)
  vv = rng.randn(v, m, d).astype(np.float32)
  tw = np.abs(rng.randn(q, m)).astype(np.float32)
  vw = np.abs(rng.randn(v, m)).astype(np.float32)

  similarity.use_pallas(True, interpret=True)
  try:
    fused = similarity._fused_moe_similarity
    want = np.asarray(jax.jit(fused)(t, vv, tw, vw))

    mesh2 = mesh_lib.data_mesh(model_parallel=2)
    both3 = NamedSharding(mesh2, P(("data", "model"), None, None))
    both2 = NamedSharding(mesh2, P(("data", "model"), None))
    rep = NamedSharding(mesh2, P())

    # Tuple-axis queries, replicated videos.
    got = jax.jit(fused, in_shardings=(both3, rep, both2, rep))(
        jax.device_put(t, both3), jax.device_put(vv, rep),
        jax.device_put(tw, both2), jax.device_put(vw, rep))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    flat = []
    for a in tuple(got.sharding.spec):
      flat.extend(a if isinstance(a, tuple) else [a])
    assert "data" in flat, got.sharding

    # Mixed partial overlap: q on 'data', v on ('data','model').
    d_row3 = NamedSharding(mesh2, P("data", None, None))
    d_row2 = NamedSharding(mesh2, P("data", None))
    got2 = jax.jit(fused, in_shardings=(d_row3, both3, d_row2, both2))(
        jax.device_put(t, d_row3), jax.device_put(vv, both3),
        jax.device_put(tw, d_row2), jax.device_put(vw, both2))
    np.testing.assert_allclose(np.asarray(got2), want, rtol=1e-5, atol=1e-5)
  finally:
    similarity.use_pallas(False)


def test_fused_retrieval_metrics_sharded_matches_unsharded():
  """metrics.fused_retrieval_metrics(mesh=...) — the sharded at-scale
  eval — equals the unsharded call on an UNEVEN corpus (padding +
  masking exercised end-to-end), from host-side numpy inputs."""
  from mmt_tpu.train import metrics as metrics_lib

  rng = np.random.RandomState(1)
  v, cpv, m, d = 21, 2, 3, 16   # 21 % 8 != 0 -> mesh pads to 24
  q = v * cpv
  te = rng.randn(q, m, d).astype(np.float32)
  ve = rng.randn(v, m, d).astype(np.float32)
  tw = np.abs(rng.randn(q, m)).astype(np.float32)
  vw = np.abs(rng.randn(v, m)).astype(np.float32)
  masks = (rng.rand(v, cpv) > 0.2).astype(np.float32)
  masks[:, 0] = 1.0

  want = metrics_lib.fused_retrieval_metrics(te, ve, tw, vw, masks)
  got = metrics_lib.fused_retrieval_metrics(te, ve, tw, vw, masks,
                                            mesh=mesh_lib.data_mesh())
  for which in ("t2v_metrics", "v2t_metrics"):
    for key in want[which]:
      np.testing.assert_allclose(got[which][key], want[which][key],
                                 rtol=1e-6, err_msg=f"{which}/{key}")


# ----------------------------------------------------------------------
# Tensor parallelism (the 'model' mesh axis; parallel/mesh.py:
# param_shardings).  The reference has none (SURVEY.md §2.2) — this is
# the TPU-native scale-up path for larger towers.
# ----------------------------------------------------------------------

def test_tensor_parallel_grads_match_single_device(tiny_arch):
  """Megatron-placed params on a 4x2 (data x model) mesh: loss and grads
  equal the single-device computation (GSPMD inserts the FFN/attention
  psums; correctness must not depend on the placement hints)."""
  model = CENet(**tiny_arch)
  batch = make_batch(tiny_arch["expert_dims"], b=8)
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
      batch, train=False)
  loss_fn = max_margin_ranking_loss(0.05, True)

  def compute(params, batch):
    out = model.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      batch, train=False)
    return loss_fn(similarity_from_outputs(out, merge="avg"))

  grad_fn = jax.value_and_grad(compute)
  loss_1, grads_1 = jax.jit(grad_fn)(variables["params"], batch)

  mesh = mesh_lib.data_mesh(model_parallel=2)
  assert mesh.devices.shape == (4, 2)
  specs = mesh_lib.param_shardings(mesh, variables["params"])
  spec_strs = [str(s.spec) for s in jax.tree_util.tree_leaves(specs)]
  # The Megatron split actually engages: column kernels (ffn_inter +
  # q/k/v), their biases, and row kernels (ffn_out + attn_out) for
  # 2 txt + 2 vid layers.
  assert spec_strs.count("PartitionSpec(None, 'model')") == 16
  assert spec_strs.count("PartitionSpec('model', None)") == 8
  assert spec_strs.count("PartitionSpec('model',)") == 16

  tp_params = mesh_lib.shard_params(mesh, variables["params"])
  sharded_batch = jax.tree_util.tree_map(
      lambda x: jax.device_put(x, mesh_lib.batch_sharding(mesh)), batch)
  loss_tp, grads_tp = jax.jit(grad_fn)(tp_params, sharded_batch)

  np.testing.assert_allclose(float(loss_1), float(loss_tp), rtol=1e-5)
  for a, b in zip(jax.tree_util.tree_leaves(grads_1),
                  jax.tree_util.tree_leaves(grads_tp)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=1e-5)


def test_tensor_parallel_trainer_e2e(tmp_path_factory):
  """Full CLI run with trainer.model_parallel=2 (4x2 mesh): training
  completes with TP-placed params, checkpoints save from the sharded
  arrays, and an UNSHARDED --only_eval of the saved checkpoint
  reproduces the TP run's final-eval similarity matrix.

  The comparison is deliberately forward-only: comparing two *training
  trajectories* (TP vs unsharded) is unstable by nature here — Adam
  amplifies the ~1e-8 collective-noise gradient differences on
  degenerate leaves into ±lr walks (see the 2-process e2e test's atol
  rationale) — while the eval forward from one set of weights is
  deterministic across layouts up to fp32 reduction order."""
  import json

  import train as train_cli
  from mmt_tpu.data import synthetic
  from tests.test_train_e2e import make_config

  root = tmp_path_factory.mktemp("tp_e2e")
  data_dir = synthetic.generate(root, num_videos=14, num_test=6,
                                experts={"rgb": 2048, "s3d": 1024},
                                captions_per_video=3)
  os.environ["MMT_TPU_BERT_VOCAB"] = str(root / "vocab.txt")

  exp_tp = tmp_path_factory.mktemp("tp_exp") / "run"
  cfg = make_config(root, data_dir, exp_tp)
  cfg["trainer"]["model_parallel"] = 2
  cfg_path = root / "tp.json"
  cfg_path.write_text(json.dumps(cfg))
  trainer = train_cli.main(["--config", str(cfg_path)])
  assert trainer.mesh is not None
  assert mesh_lib.model_axis_size(trainer.mesh) == 2
  assert trainer.mesh.devices.shape == (4, 2)
  # Params really are TP-placed (not silently replicated).
  kernels = trainer.params["txt_bert"]["encoder"]["layer_0"]
  assert "model" in str(kernels["ffn_inter"]["kernel"].sharding.spec)
  assert (exp_tp / "trained_model.msgpack").exists()
  sims_tp = np.load(exp_tp / "MSRVTT-test-sims.npy",
                    allow_pickle=True).item()["sims"]

  # Unsharded re-eval of the TP-trained checkpoint.
  exp_ev = exp_tp.parent / "eval_unsharded"
  cfg2 = make_config(root, data_dir, exp_ev)
  cfg2_path = root / "tp_eval.json"
  cfg2_path.write_text(json.dumps(cfg2))
  train_cli.main(["--config", str(cfg2_path), "--only_eval",
                  "--load_checkpoint",
                  str(exp_tp / "trained_model.msgpack")])
  sims_ev = np.load(exp_ev / "MSRVTT-test-sims.npy",
                    allow_pickle=True).item()["sims"]
  np.testing.assert_allclose(sims_tp, sims_ev, rtol=1e-4, atol=1e-5)


def test_tensor_parallel_rejects_multiprocess(tiny_arch, monkeypatch):
  """model_parallel > 1 across processes must fail loudly at
  construction (per-layer FFN psums would ride DCN)."""
  from mmt_tpu.train.trainer import Trainer

  monkeypatch.setattr(jax, "process_count", lambda: 2)
  with pytest.raises(ValueError, match="model_parallel"):
    Trainer(model=None, loss_fn=None, metrics=[], tx=None, base_lr=1e-3,
            config={"trainer": {"epochs": 1, "model_parallel": 2,
                                "save_dir": "/tmp/unused"}},
            data_loaders={}, lr_schedule=None)


def test_tensor_parallel_head_alignment():
  """q/k/v/attn_out shard only when the head count divides the model
  axis: the attention apply reshapes the flat [D, D] kernels head-major
  (models/bert.py), so a shard boundary inside a head would force GSPMD
  to reshard through the reshape every layer.  FFN sharding is
  unaffected (no head structure)."""
  mesh = mesh_lib.data_mesh(model_parallel=8)   # 1x8 on the virtual mesh
  layer = {"query": {"kernel": np.zeros((24, 24)), "bias": np.zeros(24)},
           "attn_out": {"kernel": np.zeros((24, 24)), "bias": np.zeros(24)},
           "ffn_inter": {"kernel": np.zeros((24, 96)), "bias": np.zeros(96)},
           "ffn_out": {"kernel": np.zeros((96, 24)), "bias": np.zeros(24)}}
  tree = {"txt_bert": {"encoder": {"layer_0": layer}}}

  # 12 heads % 8 != 0 -> attention stays replicated, FFN still shards.
  s = mesh_lib.param_shardings(mesh, tree, num_heads={"txt_bert": 12})
  lay = s["txt_bert"]["encoder"]["layer_0"]
  assert str(lay["query"]["kernel"].spec) == "PartitionSpec()"
  assert str(lay["attn_out"]["kernel"].spec) == "PartitionSpec()"
  assert str(lay["ffn_inter"]["kernel"].spec) == "PartitionSpec(None, 'model')"
  assert str(lay["ffn_out"]["kernel"].spec) == "PartitionSpec('model', None)"

  # 8 heads divide -> attention shards too.
  s = mesh_lib.param_shardings(mesh, tree, num_heads={"txt_bert": 8})
  lay = s["txt_bert"]["encoder"]["layer_0"]
  assert str(lay["query"]["kernel"].spec) == "PartitionSpec(None, 'model')"
  assert str(lay["attn_out"]["kernel"].spec) == "PartitionSpec('model', None)"


def test_tp_num_heads_resolves_bert_defaults():
  """A config that OMITS num_attention_heads still builds the model with
  BertParams' default head count — _tp_num_heads must report that same
  count, or the dim-divisibility fallback could shard q/k/v across head
  boundaries (config.py BertParams defaults: 4 heads)."""
  from mmt_tpu.train.trainer import Trainer

  class Holder:
    pass

  model = Holder()
  model.vid_bert_params = {"hidden_size": 512}  # no explicit head count
  model.text_bert_geometry = None
  model.txt_bert_params = None
  holder = Holder()
  holder.model = model
  heads = Trainer._tp_num_heads(holder)
  assert heads["vid_bert"] == 4    # BertParams default, what CENet builds
  assert heads["txt_bert"] == 12   # bert-base-cased


def test_tensor_parallel_unsatisfiable_request_raises(tmp_path_factory):
  """An explicit model_parallel request that cannot be honored (train
  batch does not divide the data axis) must raise, not silently run
  replicated."""
  import json

  import train as train_cli
  from mmt_tpu.data import synthetic
  from tests.test_train_e2e import make_config

  root = tmp_path_factory.mktemp("tp_bad")
  data_dir = synthetic.generate(root, num_videos=8, num_test=4,
                                experts={"rgb": 2048, "s3d": 1024},
                                captions_per_video=2)
  os.environ["MMT_TPU_BERT_VOCAB"] = str(root / "vocab.txt")
  cfg = make_config(root, data_dir, root / "exp")
  cfg["trainer"]["model_parallel"] = 2
  cfg["train_sets"][0]["args"]["batch_size"] = 3   # 3 % 4 != 0
  cfg_path = root / "bad.json"
  cfg_path.write_text(json.dumps(cfg))
  with pytest.raises(ValueError, match="model_parallel=2 was requested"):
    train_cli.main(["--config", str(cfg_path)])


def test_data_mesh_rejects_nondivisible_model_parallel():
  with pytest.raises(ValueError, match="does not divide"):
    mesh_lib.data_mesh(model_parallel=3)
