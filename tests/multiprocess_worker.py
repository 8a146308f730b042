"""Worker for the REAL 2-process jax.distributed validation.

Launched (twice) by tests/test_multihost.py and
__graft_entry__.dryrun_multiprocess with:

    python multiprocess_worker.py <process_id> <num_processes> <port> <outdir>

Each process pins 4 virtual CPU devices (8-device global mesh), joins the
coordination service via parallel.mesh.initialize_distributed, and runs
the three multi-process code paths against their single-process oracles:

  a) one DP find_direction training step with the batch sharded over the
     GLOBAL mesh — must equal the same step on one local device with the
     full batch (GSPMD inserts the cross-process grad psum; reference
     contract: metrics/metric_utils.py:95-105 rank-strided gather and
     torch_utils/training_stats.py:234-256 one-collective sync)
  b) FeatureStats.append_multihost with a REAL cross-process
     process_allgather — rows from both processes, process-major order
  c) stats.Collector(cross_process=True) — each process reports a
     disjoint set of values; global count/mean/std over the union

Results go to <outdir>/result_<process_id>.json; the parent asserts both
files exist with {"ok": true}.
"""

import json
import os
import re
import sys

# XLA_FLAGS must be set before jax import; the axon sitecustomize clobbers
# shell-level XLA_FLAGS, so the parent passes intent via argv and we set it
# here (and strip any inherited device-count, e.g. conftest's 8).
_flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=4").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# CPU cross-process collectives ride gloo (the CPU analogue of the ICI/DCN
# collective layer on real TPU slices)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Align processes via the coordination service (gRPC) BEFORE entering
    a gloo collective: gloo's rendezvous window is ~30 s, and concurrent
    XLA compiles on a 1-vCPU host can skew the processes past it. The
    barrier rides the already-connected coordination channel, so it
    tolerates arbitrary skew up to timeout_ms."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def main(process_id: int, num_processes: int, port: int, outdir: str):
    from stylemc_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes, process_id=process_id)

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert jax.process_count() == num_processes, jax.process_count()
    assert n_global == n_local * num_processes, (n_local, n_global)

    checks = {"n_local": n_local, "n_global": n_global,
              "process_index": jax.process_index()}

    # ---- (a) DP find_direction step over the global mesh ----
    from stylemc_tpu.models.stylegan2.generator import (
        GeneratorConfig, init_generator_params, mapping, w_to_s,
    )
    from stylemc_tpu.models.clip import CLIPConfig, init_clip_params
    from stylemc_tpu.models.arcface import init_backbone_params
    from stylemc_tpu.models.clip.tokenizer import FallbackTokenizer
    from stylemc_tpu.train.find_direction import (
        FindDirectionConfig, make_clip_bundles, make_loss_fn, TRAINABLE,
        precompute_original_features,
    )

    cpu0 = jax.local_devices()[0]
    with jax.default_device(cpu0):
        gen_cfg = GeneratorConfig(img_resolution=32, channel_base=2048,
                                  channel_max=64, mapping_layers=2)
        gen_params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
        clip_cfg = CLIPConfig(embed_dim=32, image_resolution=224,
                              vision_layers=1, vision_width=64,
                              vision_patch_size=56, transformer_width=64,
                              transformer_heads=2, transformer_layers=1)
        clip_models = {"ViT-B/32": (clip_cfg,
                                    init_clip_params(jax.random.PRNGKey(1),
                                                     clip_cfg))}
        arc_layout = [(8, 8, 2), (8, 16, 2), (16, 16, 1), (16, 32, 2),
                      (32, 32, 2)]
        arcface = init_backbone_params(jax.random.PRNGKey(2),
                                       layout=arc_layout)

        batch = n_global
        fdc = FindDirectionConfig(resolution=32, batch_size=batch,
                                  clip_type="small",
                                  arcface_layout=arc_layout)
        bundles = make_clip_bundles(fdc, clip_models,
                                    tokenizer=FallbackTokenizer())
        # identical full batch in every process (same seed)
        z = jax.random.normal(jax.random.PRNGKey(3), (batch, gen_cfg.z_dim))
        styles = w_to_s(gen_params, gen_cfg, mapping(gen_params, gen_cfg, z))
        id_f, clip_f = precompute_original_features(
            gen_params, gen_cfg, styles, bundles, arcface, fdc, chunk=batch)

        loss_fn = make_loss_fn(gen_params, gen_cfg, bundles, arcface, fdc)
        optimizer = optax.sgd(learning_rate=0.5)
        delta0 = jnp.zeros((1, len(TRAINABLE), 512), jnp.float32)
        opt_state0 = optimizer.init(delta0)

        def step(delta_s, opt_state, s, i_f, c_f):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                delta_s, s, i_f, c_f)
            updates, opt_state = optimizer.update(grads, opt_state, delta_s)
            return optax.apply_updates(delta_s, updates), loss

        # single-device oracle: full batch on one local device (all inputs
        # live on cpu0, so the jit executes there)
        ref_delta, ref_loss = jax.jit(step)(
            delta0, opt_state0, styles, id_f, clip_f)
        ref_delta = np.asarray(ref_delta)
        ref_loss = float(ref_loss)

    # global mesh over ALL devices (both processes)
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    data_sh = NamedSharding(mesh, P("data"))
    rep_sh = NamedSharding(mesh, P())

    def to_global(x):
        """Process-local rows → globally sharded array (each process owns
        its mesh-contiguous slice of the identical full batch)."""
        x = np.asarray(x)
        rows = x.shape[0] // num_processes
        lo = process_id * rows
        return jax.make_array_from_process_local_data(
            data_sh, x[lo:lo + rows])

    # first gloo-touching ops below (device_put of a replicated array runs
    # a cross-process assert_equal) — re-align after the skewed oracle
    # compile first
    _barrier("post_oracle_compile")
    g_styles = to_global(styles)
    g_id_f = to_global(id_f)
    g_clip_f = tuple(to_global(c) for c in clip_f)
    g_delta = jax.device_put(np.asarray(delta0), rep_sh)
    g_opt = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), rep_sh)
        if hasattr(x, "shape") else x, opt_state0)

    # compile ahead of execution, then barrier: both processes must enter
    # the gloo collectives of the DP step near-simultaneously
    dp_step = jax.jit(step, out_shardings=(rep_sh, rep_sh))
    compiled = dp_step.lower(
        g_delta, g_opt, g_styles, g_id_f, g_clip_f).compile()
    _barrier("pre_dp_step")
    dp_delta, dp_loss = compiled(
        g_delta, g_opt, g_styles, g_id_f, g_clip_f)
    # replicated output: every process holds the full value locally
    dp_delta = np.asarray(jax.device_get(
        dp_delta.addressable_data(0)))
    dp_loss = float(jax.device_get(dp_loss.addressable_data(0)))

    # Semantic comparison vs the single-device oracle. Element-wise
    # equality does NOT hold here and that is measured, not assumed:
    # batch-8-on-one-device vs batch-1-per-device changes XLA's conv/
    # reduction compilation per sample, and at RANDOM init the CLIP
    # tower (LayerNorm + softmax) amplifies those ulp-level differences
    # chaotically — a single-process 8-device mesh shows the identical
    # deviation (delta cosine 0.984, ~8% of elements beyond rtol 5e-2),
    # so this is sharding numerics, not a multi-process defect. The
    # in-repo mesh tests (test_find_direction.py:72-79) bound the same
    # effect on full optimized directions at rtol 5e-2. Here: gradient
    # direction must agree (cosine), loss must agree to 10%, and the
    # EXACT multi-process guarantees are checked below and by the
    # parent (replicated outputs bitwise-consistent across processes;
    # allgather/allreduce exact).
    assert abs(dp_loss - ref_loss) <= 0.1 * abs(ref_loss), \
        (dp_loss, ref_loss)
    ra, da = ref_delta.ravel(), dp_delta.ravel()
    cos = float(ra @ da / (np.linalg.norm(ra) * np.linalg.norm(da)))
    assert cos > 0.9, cos
    checks["dp_step_matches_single_device"] = True
    checks["dp_cosine_vs_single_device"] = cos
    checks["dp_loss"] = dp_loss
    # parent cross-checks these for exact inter-process agreement of the
    # replicated output
    checks["dp_delta_norm"] = float(np.linalg.norm(
        dp_delta.astype(np.float64)))
    checks["dp_delta_checksum"] = float(dp_delta.astype(np.float64).sum())

    # ---- (b) FeatureStats.append_multihost with REAL allgather ----
    from stylemc_tpu.metrics.feature_stats import FeatureStats

    rng = np.random.RandomState(7)  # same stream everywhere
    all_rows = rng.randn(num_processes, 5, 3).astype(np.float32)
    mine = all_rows[process_id]

    fs = FeatureStats(capture_all=True, capture_mean_cov=True)
    _barrier("pre_allgather")
    fs.append_multihost(mine)
    got = fs.get_all()
    want = all_rows.reshape(-1, 3)  # process-major concatenation
    np.testing.assert_allclose(got, want, rtol=1e-6)
    mean, cov = fs.get_mean_cov()
    w64 = want.astype(np.float64)
    np.testing.assert_allclose(mean, w64.mean(0), rtol=1e-6)
    np.testing.assert_allclose(
        cov, (w64.T @ w64) / len(w64) - np.outer(w64.mean(0), w64.mean(0)),
        rtol=1e-5, atol=1e-7)
    checks["append_multihost_real_allgather"] = True

    # ---- (c) Collector(cross_process=True) with REAL allreduce ----
    from stylemc_tpu.parallel import stats as pstats

    pstats._counters.clear()
    per_proc = rng.randn(num_processes, 16).astype(np.float32)
    c = pstats.Collector(regex="xloss")
    for v in per_proc[process_id]:
        pstats.report("xloss", v)
    _barrier("pre_collector_sync")
    c.update(cross_process=True)
    union = per_proc.reshape(-1)
    assert c.num("xloss") == union.size, c.num("xloss")
    np.testing.assert_allclose(c.mean("xloss"), union.mean(), rtol=1e-5)
    np.testing.assert_allclose(c.std("xloss"), union.std(), rtol=1e-4)
    checks["collector_cross_process_real"] = True

    checks["ok"] = True
    path = os.path.join(outdir, f"result_{process_id}.json")
    with open(path + ".tmp", "w") as f:
        json.dump(checks, f, indent=1)
    os.replace(path + ".tmp", path)
    print(f"[worker {process_id}] ok", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
