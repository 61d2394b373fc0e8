"""Data engine: brace expansion, tar sample grouping, decode, pipeline
stages, prefetch loader, datamodule preproc schema."""

import io
import json
import os
import queue
import tarfile

import numpy as np
import pytest
from PIL import Image

from x2i_tpu.data.datamodule import (DistillDataConfig, DistillDataModule,
                                     instruction_dict,
                                     synthetic_distill_batches)
from x2i_tpu.data.loader import Preprocess, PrefetchLoader, stack_collate
from x2i_tpu.data.webdataset import (Pipeline, ShardSampler, expand_urls,
                                     tar_samples)


def _write_shard(path, n, start=0):
    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n):
            key = f"{i:06d}"
            img = Image.fromarray(
                (np.random.default_rng(i).random((8, 8, 3)) * 255)
                .astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            for ext, data in [("png", buf.getvalue()),
                              ("json", json.dumps(
                                  {"caption_en": f"cap {i}"}).encode())]:
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def test_expand_urls():
    assert expand_urls("a/{000..002}.tar") == [
        "a/000.tar", "a/001.tar", "a/002.tar"]
    assert expand_urls(["x.tar", "b/{01..02}.tar"]) == [
        "x.tar", "b/01.tar", "b/02.tar"]


def test_tar_samples_grouping(tmp_path):
    shard = str(tmp_path / "000.tar")
    _write_shard(shard, 3)
    samples = list(tar_samples(iter([shard])))
    assert len(samples) == 3
    assert set(samples[0]) >= {"__key__", "png", "json"}


def test_pipeline_end_to_end(tmp_path):
    shard = str(tmp_path / "{000..001}.tar")
    _write_shard(str(tmp_path / "000.tar"), 4)
    _write_shard(str(tmp_path / "001.tar"), 4, start=4)
    sampler = ShardSampler(shard, seed=0, resample=False,
                           host_index=0, host_count=1)
    pipe = (Pipeline(tar_samples(iter(sampler)))
            .decode()
            .verify(["json", "png"])
            .map(lambda s: {"caption": s["json"]["caption_en"],
                            "img": np.asarray(s["png"])}))
    out = list(pipe)
    assert len(out) == 8
    assert out[0]["img"].shape == (8, 8, 3)


def test_shard_sampler_per_host():
    urls = [f"{i}.tar" for i in range(4)]
    s0 = ShardSampler(urls, resample=False, host_index=0, host_count=2)
    s1 = ShardSampler(urls, resample=False, host_index=1, host_count=2)
    assert set(iter(s0)) | set(iter(s1)) == set(urls)
    assert set(iter(s0)).isdisjoint(set(iter(s1)))


def test_pipeline_skips_bad_samples(tmp_path):
    shard = str(tmp_path / "000.tar")
    with tarfile.open(shard, "w") as tf:
        good = json.dumps({"caption_en": "ok"}).encode()
        bad = b"{not json"
        for key, data in [("a.json", good), ("b.json", bad),
                          ("c.json", good)]:
            info = tarfile.TarInfo(key)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    pipe = Pipeline(tar_samples(iter([shard]))).decode().map(
        lambda s: s["json"]["caption_en"])
    out = list(pipe)
    assert out == ["ok", "ok"]      # bad sample dropped, stream continues


def test_prefetch_loader_and_device_hook():
    calls = []

    class P(Preprocess):
        def has_device_preprocess(self):
            return True

        def device_preprocess(self, batch):
            calls.append(1)
            return {**batch, "extra": 1}

    batches = [{"x": np.ones((2, 3))} for _ in range(5)]
    loader = PrefetchLoader(batches, preprocess=P())
    out = list(loader)
    assert len(out) == 5 and len(calls) == 5
    assert out[0]["extra"] == 1


def test_prefetch_loader_propagates_errors():
    def gen():
        yield {"x": 1}
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(PrefetchLoader(gen()))


def test_datamodule_preproc_schema(tmp_path):
    _write_shard(str(tmp_path / "000.tar"), 4)
    cfg = DistillDataConfig(urls=str(tmp_path / "000.tar"), batch_size=2,
                            text_seq_len=16, clip_seq_len=8)

    def tok(s, n):
        ids = np.zeros(n, np.int32)
        toks = [hash(c) % 100 for c in s[:n]]
        ids[:len(toks)] = toks
        mask = np.zeros(n, bool)
        mask[:len(toks)] = True
        return ids, mask

    dm = DistillDataModule(
        cfg,
        mllm_tokenize=lambda s: tok(s, 16),
        t5_tokenize=lambda s: tok(s, 16),
        clip_tokenize=lambda s: tok(s, 8)[0],
        chat_template=lambda s: f"<user>{s}<assistant>")
    it = iter(dm.train_loader())
    batch = next(it)
    assert batch["mllm_ids"].shape == (2, 16)
    assert batch["clip_ids"].shape == (2, 8)
    assert batch["mllm_mask"].dtype == bool


def test_instruction_dict_format():
    s = instruction_dict("a cat")
    assert s == ("{'Text input': 'a cat', 'Instruction editing description'"
                 ": 'no', 'image input': 'no'}")


def test_synthetic_batches():
    it = synthetic_distill_batches(2, text_seq_len=8, clip_seq_len=4)
    b = next(iter(it))
    assert b["mllm_ids"].shape == (2, 8)
    assert b["clip_ids"].shape == (2, 4)


def test_lightcontrol_datamodule(tmp_path):
    import tarfile
    from PIL import Image
    from x2i_tpu.data.datamodule import (DistillDataConfig,
                                         LightControlDataModule)

    shard = str(tmp_path / "lc.tar")
    with tarfile.open(shard, "w") as tf:
        for i, meta in enumerate([
                {"style_zh": "梵高风格", "caption_en": "a cat"},
                {"caption_zh": "一只猫", "caption_en": "a cat"}]):
            key = f"{i:06d}"
            entries = {"json": json.dumps(meta).encode()}
            img = Image.fromarray(
                (np.random.default_rng(i).random((32, 32, 3)) * 255)
                .astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            entries["jpg"] = buf.getvalue()
            if "style_zh" in meta:
                buf2 = io.BytesIO()
                img.save(buf2, format="PNG")
                entries["png"] = buf2.getvalue()
            for ext, data in entries.items():
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

    seen_instructions = []

    def qwen_process(instruction, image):
        seen_instructions.append(instruction)
        return {"mllm_ids": np.zeros(8, np.int32),
                "mllm_mask": np.ones(8, bool)}

    dm = LightControlDataModule(
        DistillDataConfig(urls=shard, batch_size=2), qwen_process,
        caption_keep_prob=0.0)
    batch = next(iter(dm.train_loader()))
    assert batch["style_pixels"].shape == (2, 32, 32, 3)
    assert batch["style_pixels"].min() >= -1 and batch["style_pixels"].max() <= 1
    # editing pair used style_zh; self-recon used the generic instruction
    assert "梵高风格" in seen_instructions[0]
    assert "请描述这张图片" in seen_instructions[1]


def test_video_uniform_sampling(tmp_path):
    from PIL import Image
    from x2i_tpu.data.video import load_video_frames, uniform_sample_indices

    # policy: 1 fps from 24 fps video = every 24th frame; cap at 64
    idx = uniform_sample_indices(240, fps=24.0)
    assert idx == list(range(0, 240, 24))
    idx2 = uniform_sample_indices(24 * 200, fps=24.0)
    assert len(idx2) == 64

    # GIF decode path
    frames = [Image.new("RGB", (8, 8), (i * 10, 0, 0)) for i in range(25)]
    gif = str(tmp_path / "v.gif")
    frames[0].save(gif, save_all=True, append_images=frames[1:])
    out = load_video_frames(gif, assumed_fps=24.0)
    assert 1 <= len(out) <= 64

    # array input
    arr = np.zeros((50, 8, 8, 3), np.uint8)
    out2 = load_video_frames(arr, assumed_fps=24.0)
    assert len(out2) == 3   # every 24th of 50 frames

    import pytest as _pytest
    with _pytest.raises(ValueError, match="cannot decode"):
        load_video_frames(str(tmp_path / "missing.mp4"))


def test_multiprocess_loader():
    """Worker-pool sample production (the Ray/rpyc tier equivalent)."""
    from x2i_tpu.data.loader import MultiprocessLoader

    def make_iterable(worker_id, num_workers):
        return ({"w": worker_id, "i": i} for i in range(3))

    loader = MultiprocessLoader(make_iterable, num_workers=2,
                                cpu_preprocess=lambda s: {**s, "p": 1})
    out = []
    for sample in loader:
        out.append(sample)
        if len(out) == 6:
            break
    assert all(s["p"] == 1 for s in out)
    assert {s["w"] for s in out} == {0, 1}


def test_multiprocess_loader_error():
    from x2i_tpu.data.loader import MultiprocessLoader

    def make_iterable(worker_id, num_workers):
        raise RuntimeError("worker boom")

    loader = MultiprocessLoader(make_iterable, num_workers=1)
    with pytest.raises(RuntimeError, match="worker failed"):
        next(iter(loader))


def test_multiprocess_loader_finite_epoch_terminates():
    """resample=False single-epoch streams must end cleanly: workers post
    completion sentinels, the consumer drains exactly the union and the
    loop exits without blocking on the queue timeout."""
    from x2i_tpu.data.loader import MultiprocessLoader

    def make_iterable(worker_id, num_workers):
        return ({"w": worker_id, "i": i} for i in range(3))

    loader = MultiprocessLoader(make_iterable, num_workers=2)
    out = list(loader)          # must return by itself
    assert len(out) == 6
    assert sorted((s["w"], s["i"]) for s in out) == [
        (w, i) for w in (0, 1) for i in range(3)]


def test_shard_sampler_refuses_duplicated_epoch():
    """Single-epoch mode with fewer shards than hosts would silently run
    the same epoch on every host — must raise, not duplicate."""
    with pytest.raises(ValueError, match="duplicated"):
        list(ShardSampler(["only.tar"], resample=False,
                          host_index=1, host_count=2))
    # resampled mode keeps the wds.ResampledShards fallback (warns)
    s = ShardSampler(["only.tar"], resample=True,
                     host_index=1, host_count=2)
    it = iter(s)
    assert next(it) == "only.tar"
