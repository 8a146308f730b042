"""BatchEditor serving-path tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylemc_tpu.serve import BatchEditor
from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, N_STYLE_CHANNELS,
)
from stylemc_tpu.models.mapper import init_mapper_params


def _editor(**kw):
    cfg = GeneratorConfig(img_resolution=32, channel_base=1024, channel_max=64,
                          mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    d = np.zeros((1, N_STYLE_CHANNELS, 512), np.float32)
    d[:, 2, :64] = 0.5
    return BatchEditor(cfg, params, direction=d, max_batch=4, **kw)


def test_edit_seeds_pairs():
    editor = _editor()
    out = editor.edit_seeds([1, 2, 3], change_power=2.0, pairs=True)
    assert out.shape == (3, 32, 64, 3)
    assert out.dtype == np.uint8
    left, right = out[:, :, :32].astype(int), out[:, :, 32:].astype(int)
    assert np.abs(left - right).max() > 0


def test_edit_zero_power_identity():
    editor = _editor()
    out = editor.edit_seeds([5], change_power=0.0, pairs=True)
    left, right = out[0, :, :32], out[0, :, 32:]
    np.testing.assert_array_equal(left, right)


def test_bucketing_consistency():
    editor = _editor()
    styles = np.asarray(editor.styles_from_seeds([1, 2, 3, 4, 5]))
    all_at_once = editor.edit_styles(styles, change_power=1.0)
    one_by_one = np.concatenate(
        [editor.edit_styles(styles[i:i + 1], change_power=1.0)
         for i in range(5)])
    # different batch shapes reassociate conv reductions → at most ±1 uint8
    assert np.abs(all_at_once.astype(int) - one_by_one.astype(int)).max() <= 1


def test_warmup_covers_padded_bucket_of_pipeline_chunk():
    """A pipeline_chunk that is not itself a bucket size (e.g. 24) renders
    through the NEXT bucket (32): warmup must compile that bucket too or
    the first large request pays trace+compile in-request (advisor r4)."""
    cfg = GeneratorConfig(img_resolution=32, channel_base=1024,
                          channel_max=64, mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    d = np.zeros((1, N_STYLE_CHANNELS, 512), np.float32)
    editor = BatchEditor(cfg, params, direction=d, max_batch=64,
                         pipeline_chunk=24)
    warmed = []
    orig = editor.edit_styles

    def spy(styles, **kw):
        warmed.append(styles.shape[0])
        return orig(styles, **kw)

    editor.edit_styles = spy
    editor.warmup()
    assert max(warmed) == 32, warmed  # chunk 24 pads to bucket 32
    assert 64 not in warmed           # but not buckets a chunk can't reach


def test_mapper_backend():
    cfg = GeneratorConfig(img_resolution=32, channel_base=1024, channel_max=64,
                          mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    editor = BatchEditor(cfg, params,
                         mapper_params=init_mapper_params(jax.random.PRNGKey(1)),
                         max_batch=2)
    out = editor.edit_seeds([1, 2], change_power=1.0, pairs=True)
    assert out.shape == (2, 32, 64, 3)
    left, right = out[:, :, :32].astype(int), out[:, :, 32:].astype(int)
    assert np.abs(left - right).max() > 0


def test_http_server_endpoints():
    """cli/serve.py HTTP layer: /healthz, /edit, /stats over a live socket."""
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from stylemc_tpu.cli.serve import build_server, _parse_seeds

    assert _parse_seeds("1-3,7") == [1, 2, 3, 7]

    editor = _editor()
    server, service = build_server(editor, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        assert urllib.request.urlopen(f"{base}/healthz").read() == b"ok"

        r = urllib.request.urlopen(
            f"{base}/edit?seeds=1-2&power=2.0&pairs=1&format=png")
        assert r.headers["Content-Type"] == "image/png"
        img = np.asarray(Image.open(io.BytesIO(r.read())))
        assert img.shape == (2 * 32, 64, 3)  # 2 seeds vstacked, [orig|edit]

        stats = json.loads(urllib.request.urlopen(f"{base}/stats").read())
        assert stats["requests"] == 1 and "p50_ms" in stats

        # bad request → 500/400, server stays alive
        try:
            urllib.request.urlopen(f"{base}/edit?seeds=notanumber")
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code in (400, 500)
        assert urllib.request.urlopen(f"{base}/healthz").read() == b"ok"
    finally:
        server.shutdown()
        server.server_close()


def test_precision_variants_close_to_fp32():
    ref = _editor().edit_seeds([1, 2], change_power=1.0)
    for precision in ("bf16-upper", "bf16"):
        out = _editor(precision=precision).edit_seeds([1, 2],
                                                      change_power=1.0)
        # bf16 reduces mantissa to 8 bits; uint8 outputs stay within a few
        # LSBs of the fp32 render
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 6, (precision, diff.max())


def test_precision_rejects_unknown():
    import pytest
    with pytest.raises(ValueError, match="unknown precision"):
        _editor(precision="fp8")


def test_named_direction_registry():
    editor = _editor()
    d2 = np.zeros((1, N_STYLE_CHANNELS, 512), np.float32)
    d2[:, 3, 64:128] = 0.8
    editor.add_direction("beard", d2)
    editor.add_direction("smile", np.zeros((1, N_STYLE_CHANNELS, 512),
                                           np.float32))
    styles = np.asarray(editor.styles_from_seeds([1, 2]))
    default = editor.edit_styles(styles, change_power=2.0)
    beard = editor.edit_styles(styles, change_power=2.0,
                               direction_name="beard")
    noop = editor.edit_styles(styles, change_power=2.0,
                              direction_name="smile")
    orig = editor.edit_styles(styles, change_power=0.0)
    assert not np.array_equal(default, beard)
    np.testing.assert_array_equal(noop, orig)  # zero direction == no edit
    import pytest
    with pytest.raises(KeyError, match="unknown direction"):
        editor.edit_styles(styles, direction_name="nope")


def test_http_direction_param(tmp_path):
    import json
    import threading
    import urllib.request
    from stylemc_tpu.cli.serve import build_server

    editor = _editor()
    editor.add_direction("z", np.zeros((1, N_STYLE_CHANNELS, 512),
                                       np.float32))
    server, service = build_server(editor, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        names = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/directions"))
        assert names == ["z"]
        r = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/edit?seeds=1&power=2.0&direction=z")
        assert r.status == 200
        r2 = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/edit?seeds=1&direction=missing")
        assert False, "expected 500"
    except urllib.error.HTTPError as e:
        assert e.code == 500
    finally:
        server.shutdown()


@pytest.mark.nightly
def test_invert_edit_images(tmp_path):
    """Real-image serving: uint8 photos → e4e encode → the editor
    generator's S space → edit → render (the offline infer_e4e →
    w_s_converter → edit composition, served)."""
    import dataclasses
    from fabricate import fabricate_e4e_pt
    from stylemc_tpu.models.e4e.psp import load_psp_from_checkpoint
    from stylemc_tpu.models.stylegan2.generator import w_to_s

    ckpt = fabricate_e4e_pt(str(tmp_path / "e4e.pt"), stylegan_size=32)
    psp = load_psp_from_checkpoint(ckpt, stylegan_size=32)
    editor = _editor()
    editor.attach_inverter(psp)

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, size=(3, 256, 256, 3), dtype=np.uint8)

    # manual composition oracle
    x = jnp.transpose(jnp.asarray(imgs, jnp.float32), (0, 3, 1, 2)) \
        / 127.5 - 1.0
    codes = psp.encode(x)
    s_ref = w_to_s(editor.params, editor.cfg, codes)
    s_srv = editor.invert_images(imgs)
    np.testing.assert_allclose(np.asarray(s_srv), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-4)

    # warmup must pre-compile the invert path too (the first POST
    # /edit_image otherwise pays the encoder trace+compile in-request)
    editor.warmup()

    out = editor.edit_images(imgs, change_power=2.0, pairs=True)
    assert out.shape == (3, 32, 64, 3) and out.dtype == np.uint8
    left, right = out[:, :, :32].astype(int), out[:, :, 32:].astype(int)
    assert np.abs(left - right).max() > 0
    # zero power → reconstruction == edit
    out0 = editor.edit_images(imgs, change_power=0.0, pairs=True)
    np.testing.assert_array_equal(out0[:, :, :32], out0[:, :, 32:])


@pytest.mark.slow
def test_attach_inverter_resolution_mismatch(tmp_path):
    from fabricate import fabricate_e4e_pt
    from stylemc_tpu.models.e4e.psp import load_psp_from_checkpoint

    ckpt = fabricate_e4e_pt(str(tmp_path / "e4e64.pt"), stylegan_size=64)
    psp = load_psp_from_checkpoint(ckpt, stylegan_size=64)
    editor = _editor()
    with pytest.raises(ValueError, match="64px"):
        editor.attach_inverter(psp)


@pytest.mark.slow
def test_http_edit_image_post(tmp_path):
    """POST /edit_image: one photo in, inverted+edited render out; 400
    without an inverter."""
    import io
    import threading
    import urllib.request
    import urllib.error

    from PIL import Image
    from fabricate import fabricate_e4e_pt
    from stylemc_tpu.models.e4e.psp import load_psp_from_checkpoint
    from stylemc_tpu.cli.serve import build_server

    editor = _editor()
    server, service = build_server(editor, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    rng = np.random.RandomState(1)
    photo = Image.fromarray(
        rng.randint(0, 256, size=(300, 280, 3), dtype=np.uint8), "RGB")
    buf = io.BytesIO()
    photo.save(buf, format="PNG")
    body = buf.getvalue()

    def post(query=""):
        req = urllib.request.Request(
            f"{base}/edit_image{query}", data=body, method="POST",
            headers={"Content-Type": "image/png"})
        return urllib.request.urlopen(req)

    try:
        # no inverter yet → 400
        try:
            post()
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        ckpt = fabricate_e4e_pt(str(tmp_path / "e4e.pt"), stylegan_size=32)
        editor.attach_inverter(load_psp_from_checkpoint(ckpt,
                                                        stylegan_size=32))
        r = post("?power=2.0&pairs=1&format=png")
        assert r.headers["Content-Type"] == "image/png"
        img = np.asarray(Image.open(io.BytesIO(r.read())))
        assert img.shape == (32, 64, 3)  # [recon | edited]
        assert np.abs(img[:, :32].astype(int)
                      - img[:, 32:].astype(int)).max() > 0
    finally:
        server.shutdown()
        server.server_close()

# ------------------------------------------------------ request coalescing

def test_coalescing_dispatcher_merges():
    """Concurrent same-key submissions merge into one (or few) batched fn
    calls; every submitter gets exactly its slice back."""
    import threading

    from stylemc_tpu.serve import CoalescingDispatcher

    calls = []

    def fn(batch):
        calls.append(batch.shape[0])
        return batch * 2

    disp = CoalescingDispatcher(max_batch=16, max_wait_ms=250.0)
    try:
        results = {}

        def worker(i):
            rows = np.full((1, 3), i, np.float32)
            results[i] = disp.submit("k", rows, fn)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert len(results) == 8
        for i, out in results.items():
            np.testing.assert_array_equal(out, np.full((1, 3), 2 * i))
        # 8 items should land in very few drains (first waits 250 ms)
        assert disp.coalesced_items == 8
        assert disp.batched_calls <= 3, calls
        assert sum(calls) == 8
    finally:
        disp.close()


def test_coalescing_dispatcher_groups_by_key_and_errors():
    """Different keys never share a batch; exceptions reach only their own
    submitters and the dispatcher keeps serving."""
    import threading

    from stylemc_tpu.serve import CoalescingDispatcher

    disp = CoalescingDispatcher(max_batch=16, max_wait_ms=150.0)
    try:
        outs, errs = {}, {}

        def ok_fn(batch):
            return batch + 100

        def bad_fn(batch):
            raise ValueError("boom")

        def worker(i):
            key, fn = (("a", ok_fn) if i % 2 == 0 else ("b", bad_fn))
            try:
                outs[i] = disp.submit(key, np.full((1,), i, np.float32), fn)
            except ValueError as e:
                errs[i] = str(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert sorted(outs) == [0, 2, 4] and sorted(errs) == [1, 3, 5]
        for i in outs:
            np.testing.assert_array_equal(outs[i], [i + 100])
        # still alive after the failing group
        np.testing.assert_array_equal(
            disp.submit("a", np.zeros((1,), np.float32), ok_fn), [100.0])
    finally:
        disp.close()


def test_http_coalescing_end_to_end():
    """build_server(coalesce_ms>0): concurrent /edit requests coalesce into
    fewer device dispatches (stats expose batched_calls) and responses stay
    per-request correct."""
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from stylemc_tpu.cli.serve import build_server

    editor = _editor()
    editor.warmup()
    server, service = build_server(editor, host="127.0.0.1", port=0,
                                   coalesce_ms=200.0, max_batch=4)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        shapes = {}

        def get(i):
            r = urllib.request.urlopen(
                f"{base}/edit?seeds={i}&power=2.0&format=png")
            shapes[i] = np.asarray(Image.open(io.BytesIO(r.read()))).shape

        threads = [threading.Thread(target=get, args=(i,)) for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=30)
        assert all(shapes[i] == (32, 32, 3) for i in range(4)), shapes
        stats = json.loads(urllib.request.urlopen(f"{base}/stats").read())
        assert stats["requests"] == 4
        assert stats["coalesced_items"] == 4
        assert stats["batched_calls"] <= 3, stats
    finally:
        server.shutdown()
        server.server_close()


# ------------------------------------------------------------ mesh serving

def test_mesh_serving_matches_single():
    """BatchEditor(mesh=8-device data mesh): sharded buckets produce the
    same images as the single-device editor; buckets smaller than the mesh
    fall back to the replicated program."""
    from jax.sharding import PartitionSpec as P

    from stylemc_tpu.parallel.mesh import data_mesh

    mesh = data_mesh()
    assert mesh.devices.size == 8

    cfg = GeneratorConfig(img_resolution=32, channel_base=1024,
                          channel_max=64, mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    d = np.zeros((1, N_STYLE_CHANNELS, 512), np.float32)
    d[:, 2, :64] = 0.5
    single = BatchEditor(cfg, params, direction=d, max_batch=16)
    sharded = BatchEditor(cfg, params, direction=d, max_batch=16, mesh=mesh)

    styles = np.asarray(single.styles_from_seeds(range(16)))
    want = single.edit_styles(styles, change_power=1.5)
    got = sharded.edit_styles(styles, change_power=1.5)
    # sharded conv reductions reassociate → at most ±1 uint8
    assert np.abs(want.astype(int) - got.astype(int)).max() <= 1

    # the batch-16 render really runs sharded
    out = sharded._render(sharded.params,
                          jnp.asarray(styles, jnp.float32))
    assert out.sharding.spec == P("data"), out.sharding

    # a batch-2 request (smaller than the mesh) still works via fallback
    small = sharded.edit_styles(styles[:2], change_power=1.5)
    assert np.abs(want[:2].astype(int) - small.astype(int)).max() <= 1
