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
