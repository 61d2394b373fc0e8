"""Serving engine: batching, padding, concurrency, error propagation; plus
whisper chunked-attention bias semantics."""

import threading
import time

import numpy as np
import pytest

from x2i_tpu.models.whisper_enc import chunk_bias
from x2i_tpu.serve import BatchingServer


def test_batches_fill_and_pad():
    seen = []

    def gen(batch):
        seen.append(len(batch))
        return np.stack([np.full((2, 2, 3), r.get("v", 0), np.uint8)
                         for r in batch])

    srv = BatchingServer(gen, batch_size=4, max_wait_s=0.2)
    futs = [srv.submit({"v": i}) for i in range(4)]
    outs = [f.result(5) for f in futs]
    for i, o in enumerate(outs):
        assert (o == i).all()
    assert seen[0] == 4          # full batch (padded list is size 4 anyway)
    srv.close()


def test_partial_batch_runs_smallest_bucket():
    """A lone request at batch_size 4 runs the size-1 compiled bucket —
    no duplicate-request compute at partial load."""
    sizes = []

    def gen(batch):
        sizes.append(len(batch))
        return np.zeros((len(batch), 1, 1, 3), np.uint8)

    srv = BatchingServer(gen, batch_size=4, max_wait_s=0.01)
    assert srv.buckets == [1, 2, 4]
    out = srv.generate({"v": 1}, timeout=5)
    assert out.shape == (1, 1, 3)
    assert sizes[0] == 1
    srv.close()


def test_three_requests_pad_to_bucket_four():
    sizes = []

    def gen(batch):
        sizes.append(len(batch))
        return np.stack([np.full((1, 1, 3), r.get("v", 0), np.uint8)
                         for r in batch])

    srv = BatchingServer(gen, batch_size=4, max_wait_s=0.5)
    futs = [srv.submit({"v": i}) for i in range(3)]
    outs = [f.result(timeout=10) for f in futs]
    assert sizes[0] == 4         # 3 -> next bucket (4), one pad slot
    assert [int(o[0, 0, 0]) for o in outs] == [0, 1, 2]
    srv.close()


def test_bucket_validation():
    with pytest.raises(ValueError, match="top out"):
        BatchingServer(lambda b: None, batch_size=4, buckets=[1, 2])


def test_concurrent_producers():
    def gen(batch):
        return np.stack([np.full((1, 1, 3), r["v"], np.uint8)
                         for r in batch])

    srv = BatchingServer(gen, batch_size=2, max_wait_s=0.1)
    results = {}

    def producer(i):
        results[i] = srv.generate({"v": i}, timeout=10)

    threads = [threading.Thread(target=producer, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(6):
        assert (results[i] == i).all()
    srv.close()


def test_error_propagates():
    def gen(batch):
        raise RuntimeError("bad batch")

    srv = BatchingServer(gen, batch_size=1)
    with pytest.raises(RuntimeError, match="bad batch"):
        srv.generate({"v": 1}, timeout=5)
    srv.close()


def test_chunk_bias():
    b = chunk_bias(6, 2)[0, 0]
    # frame 0,1 in chunk 0: attend cols 0..1 only
    assert (b[0, :2] == 0).all() and (b[0, 2:] < -1e29).all()
    # frame 4,5 in chunk 2: attend cols 0..5 (full left context)
    assert (b[5] == 0).all()
    b1 = chunk_bias(6, 2, num_left_chunks=1)[0, 0]
    # frame 5 (chunk 2) with 1 left chunk: cols 2..5
    assert (b1[5, 2:] == 0).all() and (b1[5, :2] < -1e29).all()


@pytest.mark.slow
def test_pipeline_serving_integration():
    """BatchingServer over the real pipeline: concurrent prompts get their
    own images through one batched jitted generate."""
    from x2i_tpu.pipeline import build_random_pipeline
    pipe = build_random_pipeline("tiny")
    srv = pipe.serving_server(batch_size=2, max_wait_s=0.2)
    futs = [srv.submit({"task": "text2image", "prompt": p})
            for p in ("a red cat", "a blue dog")]
    imgs = [f.result(300) for f in futs]
    assert imgs[0].shape == (64, 64, 3)
    assert not np.array_equal(imgs[0], imgs[1])   # different prompts
    srv.close()


def test_encode_batch_matches_serial():
    """The single-prefill batched encoder produces the same conditioning
    (and run_batch the same images) as per-request serial encodes."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from x2i_tpu.pipeline import build_random_pipeline

    pipe = build_random_pipeline("tiny")
    assert pipe.encoder_batch_fn is not None
    reqs = [{"prompt": f"req {i}", "task": "text2image"} for i in range(3)]

    pooled_b, embeds_b = pipe.encode_batch(reqs)
    serial = dataclasses.replace(pipe, encoder_batch_fn=None)
    pooled_s, embeds_s = serial.encode_batch(reqs)
    np.testing.assert_allclose(np.asarray(pooled_b, np.float32),
                               np.asarray(pooled_s, np.float32),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(embeds_b, np.float32),
                               np.asarray(embeds_s, np.float32),
                               atol=1e-5)


@pytest.mark.slow
def test_run_batch_batched_encoder_images():
    """run_batch with the single-prefill batched encoder produces the
    same images as serial encodes, and uniformly-use_answer batches take
    the serial fallback (NB a batch must be uniformly use_answer or not:
    answer tokens extend the conditioning sequence)."""
    import dataclasses

    import numpy as np

    from x2i_tpu.pipeline import build_random_pipeline

    pipe = build_random_pipeline("tiny")
    reqs = [{"prompt": f"req {i}", "task": "text2image"} for i in range(3)]
    serial = dataclasses.replace(pipe, encoder_batch_fn=None)
    imgs_b = pipe.run_batch(reqs, seed=5)
    imgs_s = serial.run_batch(reqs, seed=5)
    assert imgs_b.shape[0] == 3
    np.testing.assert_array_equal(imgs_b, imgs_s)

    _, embeds_b = pipe.encode_batch(reqs)
    answered = [{"prompt": f"why {i}", "task": "text2image",
                 "use_answer": True} for i in range(2)]
    pooled_a, embeds_a = pipe.encode_batch(answered)
    assert pooled_a.shape[0] == 2
    assert embeds_a.shape[1] > embeds_b.shape[1]   # prefill + answer


def test_encode_batch_images_matches_serial():
    """Batched multimodal encode: all requests' images concatenated into
    ONE vision-tower call + one (N, S) prefill must equal per-request
    serial encodes. This pins the scatter alignment the batched path in
    convert/load.py::encoder_batch_fn relies on — embed_multimodal's
    flat cumsum routes features to rows strictly by request order, and a
    text-only row in the middle must not shift the mapping."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from x2i_tpu.core.config import Qwen2Config
    from x2i_tpu.data.qwen_vision import (get_rope_index,
                                          prepare_vision_inputs)
    from x2i_tpu.models.qwen2_5_vl import (Qwen2_5_VLConfig,
                                           Qwen2_5_VLEncoder,
                                           QwenVisionConfig)

    vis_cfg = QwenVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
        window_size=16, out_hidden_size=48, fullatt_block_indexes=(1,),
        dtype=jnp.float32, param_dtype=jnp.float32)
    llm_cfg = Qwen2Config(vocab_size=64, hidden_size=48,
                          intermediate_size=96, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2,
                          head_dim=12, rope_theta=1e6, dtype=jnp.float32,
                          param_dtype=jnp.float32,
                          use_pallas_attention=False)
    cfg = Qwen2_5_VLConfig(vision=vis_cfg, llm=llm_cfg,
                           mrope_section=(1, 2, 3), image_token_id=7,
                           video_token_id=8, vision_start_token_id=9)
    enc = Qwen2_5_VLEncoder(cfg)
    vkw = dict(max_pixels=24 * 24, patch_size=4, merge_size=2,
               temporal_patch_size=2, window_size=16)

    r = np.random.default_rng(0)
    img_a = Image.fromarray((r.random((24, 24, 3)) * 255).astype(np.uint8))
    img_b = Image.fromarray((r.random((16, 16, 3)) * 255).astype(np.uint8))
    req_images = [[img_a], [], [img_b]]          # text-only row in between

    S = 80
    rows, vins = [], []
    for imgs in req_images:
        vin = prepare_vision_inputs(imgs or None, **vkw)
        vins.append(vin)
        ids = [10, 11]
        if vin is not None:
            n = int(np.prod(vin["image_grid_thw"][0])) // 4
            ids += [9] + [7] * n + [12]
        ids += [13, 14]
        mask = [1] * len(ids) + [0] * (S - len(ids))
        rows.append((np.asarray([ids + [0] * (S - len(ids))], np.int32),
                     np.asarray([mask], np.int64)))

    def pos3d_of(ids, mask, grids):
        pos, _ = get_rope_index(
            ids, image_grid_thw=grids, attention_mask=mask,
            spatial_merge_size=2, image_token_id=7, video_token_id=8,
            vision_start_token_id=9)
        return pos

    def vdict_of(vin):
        if vin is None:
            return None
        return {k: jnp.asarray(vin[k]) for k in
                ("patches", "pos_hw", "window_seg", "image_seg",
                 "reverse_index")}

    # init once on the batched shapes
    ids_all = np.concatenate([r0 for r0, _ in rows], axis=0)
    mask_all = np.concatenate([m for _, m in rows], axis=0)
    vin_all = prepare_vision_inputs([img_a, img_b], **vkw)
    pos_all = pos3d_of(ids_all, mask_all, vin_all["image_grid_thw"])
    params = enc.init(jax.random.key(0), jnp.asarray(ids_all),
                      jnp.asarray(mask_all, bool), jnp.asarray(pos_all),
                      vdict_of(vin_all))

    batched = enc.apply(params, jnp.asarray(ids_all),
                        jnp.asarray(mask_all, bool), jnp.asarray(pos_all),
                        vdict_of(vin_all))
    serial = []
    for (ids, mask), vin in zip(rows, vins):
        grids = None if vin is None else vin["image_grid_thw"]
        pos = pos3d_of(ids, mask, grids)
        serial.append(enc.apply(params, jnp.asarray(ids),
                                jnp.asarray(mask, bool), jnp.asarray(pos),
                                vdict_of(vin)))
    serial = jnp.concatenate(serial, axis=0)
    np.testing.assert_allclose(np.asarray(batched, np.float32),
                               np.asarray(serial, np.float32),
                               atol=2e-4, rtol=2e-4)


def test_concat_vision_inputs_matches_global_prepare():
    """For image-only request lists the request-major merge must equal
    the single global prepare call bit for bit (same grid order), pinning
    the segment/reverse-index offset bookkeeping."""
    from PIL import Image

    from x2i_tpu.data.qwen_vision import (concat_vision_inputs,
                                          prepare_vision_inputs)

    vkw = dict(max_pixels=24 * 24, patch_size=4, merge_size=2,
               temporal_patch_size=2, window_size=16)
    r = np.random.default_rng(3)
    img_a = Image.fromarray((r.random((24, 24, 3)) * 255).astype(np.uint8))
    img_b = Image.fromarray((r.random((16, 16, 3)) * 255).astype(np.uint8))

    merged = concat_vision_inputs([
        prepare_vision_inputs([img_a], **vkw), None,
        prepare_vision_inputs([img_b], **vkw)])
    whole = prepare_vision_inputs([img_a, img_b], **vkw)
    for k in ("patches", "pos_hw", "window_seg", "image_seg",
              "reverse_index", "image_grid_thw"):
        np.testing.assert_array_equal(merged[k], whole[k], err_msg=k)
    assert concat_vision_inputs([None, None]) is None


def test_encode_batch_video_matches_serial():
    """Batched encode with a VIDEO request in the middle: the per-request
    merge (concat_vision_inputs) must keep features in request order —
    request 0's image features, then request 1's video features — which a
    global prepare_vision_inputs call would NOT (it emits all images
    before all videos). Pins the batched-video path in
    convert/load.py::encoder_batch_fn."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from x2i_tpu.core.config import Qwen2Config
    from x2i_tpu.data.qwen_vision import (concat_vision_inputs,
                                          get_rope_index,
                                          prepare_vision_inputs)
    from x2i_tpu.models.qwen2_5_vl import (Qwen2_5_VLConfig,
                                           Qwen2_5_VLEncoder,
                                           QwenVisionConfig)

    vis_cfg = QwenVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
        window_size=16, out_hidden_size=48, fullatt_block_indexes=(1,),
        dtype=jnp.float32, param_dtype=jnp.float32)
    llm_cfg = Qwen2Config(vocab_size=64, hidden_size=48,
                          intermediate_size=96, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2,
                          head_dim=12, rope_theta=1e6, dtype=jnp.float32,
                          param_dtype=jnp.float32,
                          use_pallas_attention=False)
    cfg = Qwen2_5_VLConfig(vision=vis_cfg, llm=llm_cfg,
                           mrope_section=(1, 2, 3), image_token_id=7,
                           video_token_id=8, vision_start_token_id=9)
    enc = Qwen2_5_VLEncoder(cfg)
    vkw = dict(max_pixels=24 * 24, video_max_pixels=24 * 24, patch_size=4,
               merge_size=2, temporal_patch_size=2, window_size=16)

    r = np.random.default_rng(1)
    img = Image.fromarray((r.random((24, 24, 3)) * 255).astype(np.uint8))
    frames = [Image.fromarray((r.random((16, 16, 3)) * 255)
                              .astype(np.uint8)) for _ in range(4)]
    # request 0: image; request 1: text-only; request 2: video
    reqs = [([img], None), ([], None), ([], frames)]

    S = 112
    rows, vins = [], []
    for images, video in reqs:
        vin = prepare_vision_inputs(
            images or None, [video] if video is not None else None, **vkw)
        vins.append(vin)
        ids = [10, 11]
        if vin is not None:
            for g in vin["image_grid_thw"]:
                ids += [9] + [7] * (int(np.prod(g)) // 4) + [12]
            for g in vin["video_grid_thw"]:
                ids += [9] + [8] * (int(np.prod(g)) // 4) + [12]
        ids += [13, 14]
        mask = [1] * len(ids) + [0] * (S - len(ids))
        rows.append((np.asarray([ids + [0] * (S - len(ids))], np.int32),
                     np.asarray([mask], np.int64)))

    def pos3d_of(ids, mask, vin):
        pos, _ = get_rope_index(
            ids,
            image_grid_thw=None if vin is None else vin["image_grid_thw"],
            video_grid_thw=None if vin is None else vin["video_grid_thw"],
            attention_mask=mask, spatial_merge_size=2, image_token_id=7,
            video_token_id=8, vision_start_token_id=9)
        return pos

    def vdict_of(vin):
        if vin is None:
            return None
        return {k: jnp.asarray(vin[k]) for k in
                ("patches", "pos_hw", "window_seg", "image_seg",
                 "reverse_index")}

    ids_all = np.concatenate([r0 for r0, _ in rows], axis=0)
    mask_all = np.concatenate([m for _, m in rows], axis=0)
    vin_all = concat_vision_inputs(vins)
    pos_all = np.concatenate(
        [pos3d_of(ids, mask, vin) for (ids, mask), vin in zip(rows, vins)],
        axis=1)
    params = enc.init(jax.random.key(0), jnp.asarray(ids_all),
                      jnp.asarray(mask_all, bool), jnp.asarray(pos_all),
                      vdict_of(vin_all))

    batched = enc.apply(params, jnp.asarray(ids_all),
                        jnp.asarray(mask_all, bool), jnp.asarray(pos_all),
                        vdict_of(vin_all))
    serial = []
    for (ids, mask), vin in zip(rows, vins):
        pos = pos3d_of(ids, mask, vin)
        serial.append(enc.apply(params, jnp.asarray(ids),
                                jnp.asarray(mask, bool), jnp.asarray(pos),
                                vdict_of(vin)))
    serial = jnp.concatenate(serial, axis=0)
    np.testing.assert_allclose(np.asarray(batched, np.float32),
                               np.asarray(serial, np.float32),
                               atol=2e-4, rtol=2e-4)
