"""Datamodule parity goldens: our DistillDataModule preproc vs the
reference's own `utils/datamodule_{minicpm,qwenvl,internvl}.py` preproc.

The reference preproc is pure tokenization over injected tokenizer
objects (ImageEmbeddingDataset.preproc; see ref_loader's datamodule
stubs), so both sides share ONE deterministic fake tokenizer family and
the ids/masks must match bit-for-bit. This pins the drift-prone host
code: the instruction dict literal, the per-family chat-template form
(string vs typed-list content; InternVL's commented-out template),
pad-to-512 MLLM ids, and the T5 (512) / CLIP (77) teacher ids.

A second test feeds a real tar shard through our webdataset pipeline
(ShardSampler -> tar_samples -> decode -> verify -> map -> batch) and
checks the batches equal the reference preproc applied per-sample.
"""

import io
import json
import tarfile

import numpy as np
import pytest
import torch

import ref_loader
from x2i_tpu.data.datamodule import (DistillDataConfig, DistillDataModule,
                                     family_chat_template)

CAPTIONS = [
    "A red cat sitting on a wooden chair",
    "Ein Hund im Schnee, photorealistic, 8k",
    "一只熊猫在竹林里",   # Chinese
]


class _Batch(dict):
    """dict with attribute access: the reference reads `.input_ids`, our
    tokenize fns read `["input_ids"]`."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


class FakeTokenizer:
    """Deterministic char-level HF-style tokenizer shared by both sides."""

    def __init__(self, default_max_length=512):
        self.default_max_length = default_max_length

    def _encode(self, text, max_length):
        ids = [1 + (ord(c) % 997) for c in text][:max_length]
        mask = [1] * len(ids) + [0] * (max_length - len(ids))
        ids = ids + [0] * (max_length - len(ids))
        return ids, mask

    def __call__(self, text, max_length=None, return_tensors=None, **kw):
        texts = text if isinstance(text, list) else [text]
        max_length = max_length or self.default_max_length
        pairs = [self._encode(t, max_length) for t in texts]
        ids = [p[0] for p in pairs]
        mask = [p[1] for p in pairs]
        if return_tensors == "pt":
            ids, mask = torch.tensor(ids), torch.tensor(mask)
        elif len(texts) == 1 and not isinstance(text, list):
            ids, mask = ids[0], mask[0]
        return _Batch(input_ids=ids, attention_mask=mask)

    def apply_chat_template(self, messages, tokenize=False,
                            add_generation_prompt=True):
        parts = []
        for m in messages:
            content = m["content"]
            if isinstance(content, list):   # typed parts (qwen form)
                content = "".join(
                    "<|vision|>" if p.get("type") in ("image", "video")
                    else p["text"] for p in content)
            parts.append(f"<|im_start|>{m['role']}\n{content}<|im_end|>\n")
        if add_generation_prompt:
            parts.append("<|im_start|>assistant\n")
        assert not tokenize
        return "".join(parts)


class FakeMiniCPMProcessor:
    """Mimics MiniCPMOProcessor's surface used by datamodule_minicpm:
    `.tokenizer.apply_chat_template` + a __call__ taking omni kwargs."""

    def __init__(self):
        self.tokenizer = FakeTokenizer()

    def __call__(self, texts, max_length=512, **kw):
        return self.tokenizer(texts, max_length=max_length,
                              return_tensors="pt")


def _reference_preproc(family, caption, mllm_tok, t5_tok, clip_tok):
    mod = ref_loader.load_reference_datamodule(family)
    ds = object.__new__(mod.ImageEmbeddingDataset)   # preproc only
    ds.tokenizer_t5 = mllm_tok
    ds.tokenizer_t5_en = t5_tok
    ds.tokenizer_en = clip_tok
    return ds.preproc({"json": {"caption_en": caption}})


def _our_datamodule(model_name, mllm_tok, t5_tok, clip_tok, urls=None):
    """Wired exactly like train/assemble.py (same tokenize fns, same
    family_chat_template)."""
    chat_tok = (mllm_tok.tokenizer
                if isinstance(mllm_tok, FakeMiniCPMProcessor) else mllm_tok)

    def mllm_tokenize(prompt):
        out = mllm_tok(prompt, max_length=512)
        ids = np.asarray(out["input_ids"]).reshape(-1)
        mask = np.asarray(out["attention_mask"]).reshape(-1)
        return ids, mask

    def t5_tokenize(caption):
        out = t5_tok(caption, max_length=512)
        return out["input_ids"], out["attention_mask"]

    def clip_tokenize(caption):
        return clip_tok(caption, max_length=77)["input_ids"]

    return DistillDataModule(
        DistillDataConfig(urls=urls, batch_size=1),
        mllm_tokenize=mllm_tokenize, t5_tokenize=t5_tokenize,
        clip_tokenize=clip_tokenize,
        chat_template=family_chat_template(model_name, chat_tok))


FAMILIES = [
    ("minicpm", "x2i-minicpm-o-2.6"),
    ("qwenvl", "x2i-qwenvl2.5-7b"),
    ("internvl", "x2i-internvl2.5-1b"),
]


@pytest.mark.parametrize("family,model_name", FAMILIES)
@pytest.mark.parametrize("caption", CAPTIONS)
def test_preproc_matches_reference(family, model_name, caption):
    mllm_tok = (FakeMiniCPMProcessor() if family == "minicpm"
                else FakeTokenizer())
    t5_tok, clip_tok = FakeTokenizer(), FakeTokenizer(77)

    ref = _reference_preproc(family, caption, mllm_tok, t5_tok, clip_tok)
    dm = _our_datamodule(model_name, mllm_tok, t5_tok, clip_tok)
    ours = dm.preproc({"json": {"caption_en": caption}})

    np.testing.assert_array_equal(
        ours["mllm_ids"], np.asarray(ref["input_ids_t5"])[0])
    np.testing.assert_array_equal(
        ours["mllm_mask"].astype(np.int64),
        np.asarray(ref["attention_mask"])[0])
    np.testing.assert_array_equal(
        ours["t5_ids"], np.asarray(ref["input_ids_t5_en"])[0])
    np.testing.assert_array_equal(
        ours["clip_ids"], np.asarray(ref["input_ids_en"])[0])
    assert ours["mllm_ids"].shape == (512,)
    assert ours["clip_ids"].shape == (77,)


def _write_fixture_tar(path):
    from PIL import Image
    with tarfile.open(path, "w") as tar:
        for i, cap in enumerate(CAPTIONS):
            img = Image.fromarray(
                (np.random.default_rng(i).random((32, 32, 3)) * 255)
                .astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            for ext, data in (("jpg", buf.getvalue()),
                              ("json", json.dumps(
                                  {"caption_en": cap}).encode())):
                info = tarfile.TarInfo(f"{i:06d}.{ext}")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))


def test_tar_pipeline_matches_reference(tmp_path):
    """Full loader path over a real shard: batches from our webdataset
    pipeline equal the reference preproc applied to the same samples."""
    shard = str(tmp_path / "fixture.tar")
    _write_fixture_tar(shard)

    mllm_tok = FakeTokenizer()
    t5_tok, clip_tok = FakeTokenizer(), FakeTokenizer(77)
    dm = _our_datamodule("x2i-qwenvl2.5-7b", mllm_tok, t5_tok, clip_tok,
                         urls=[shard])

    from x2i_tpu.data.webdataset import Pipeline, tar_samples
    pipe = (Pipeline(tar_samples(iter([shard])))
            .decode().verify(["json"]).map(dm.preproc))
    got = list(pipe)
    assert len(got) == len(CAPTIONS)
    for sample, cap in zip(got, CAPTIONS):
        ref = _reference_preproc("qwenvl", cap, mllm_tok, t5_tok,
                                 clip_tok)
        np.testing.assert_array_equal(
            sample["mllm_ids"], np.asarray(ref["input_ids_t5"])[0])
        np.testing.assert_array_equal(
            sample["t5_ids"], np.asarray(ref["input_ids_t5_en"])[0])
        np.testing.assert_array_equal(
            sample["clip_ids"], np.asarray(ref["input_ids_en"])[0])
