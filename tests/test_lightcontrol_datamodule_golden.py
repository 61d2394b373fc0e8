"""LightControl datamodule parity vs the reference's own
utils/datamodule_lightcontrol.py preproc (loaded with ref_loader's
import stubs; preproc is pure tokenization + PIL over injected objects).

Pins: the editing-pair branch (Chinese instruction dict with style_zh,
256^2 condition, png target) and the self-reconstruction branch (128^2
condition, 90% generic-caption dropout), the chat-template message form
(typed content list with the image part), and the pixel tensors (the
reference emits CHW torchvision tensors in [-1, 1]; ours NHWC — compared
transposed). The T5/CLIP teacher ids the reference collates are never
read by its trainer (train_lightcontrol.py uses Qwen states only), so
our module does not emit them.
"""

import numpy as np
import pytest
import torch

import ref_loader
from x2i_tpu.data.datamodule import DistillDataConfig, LightControlDataModule


class _Batch(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


class FakeQwenProcessor:
    """Deterministic stand-in for AutoProcessor: char-level ids, image
    parts render as a fixed vision token, pixel_values is the raw resized
    image array (enough to prove both sides hand the SAME image in)."""

    def apply_chat_template(self, messages, tokenize=False,
                            add_generation_prompt=True):
        parts = []
        for m in messages:
            content = m["content"]
            if isinstance(content, list):
                content = "".join(
                    "<|vision|>" if p.get("type") in ("image", "video")
                    else p["text"] for p in content)
            parts.append(f"<|im_start|>{m['role']}\n{content}<|im_end|>\n")
        if add_generation_prompt:
            parts.append("<|im_start|>assistant\n")
        return "".join(parts)

    def __call__(self, text, images=None, videos=None, max_length=512,
                 return_tensors=None, **kw):
        texts = text if isinstance(text, list) else [text]
        ids, mask = [], []
        for t in texts:
            i = [1 + (ord(c) % 997) for c in t][:max_length]
            mask.append([1] * len(i) + [0] * (max_length - len(i)))
            ids.append(i + [0] * (max_length - len(i)))
        out = _Batch(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask))
        if images:
            arrs = [np.asarray(im.convert("RGB"), np.float32) / 255.0
                    for im in images]
            out["pixel_values"] = torch.tensor(np.stack(arrs))
            out["image_grid_thw"] = torch.tensor(
                [[1, im.height // 14, im.width // 14] for im in images])
        return out


def _images(rng, size=64):
    from PIL import Image
    return Image.fromarray((rng.random((size, size, 3)) * 255)
                           .astype(np.uint8))


def _reference_preproc(sample, proc):
    mod = ref_loader.load_reference_datamodule("lightcontrol")
    ds = object.__new__(mod.ImageEmbeddingDataset)
    ds.tokenizer_t5 = proc
    ds.tokenizer_t5_en = FakeQwenProcessor()
    ds.tokenizer_en = FakeQwenProcessor()
    # the reference composes torchvision ToTensor+Normalize(0.5) -> CHW
    # in [-1, 1]; torchvision is stubbed at import, so supply the real
    # composition here
    def image_transforms(img):
        arr = np.asarray(img, np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None]
        return torch.tensor((arr - 0.5) / 0.5).permute(2, 0, 1)
    ds.image_transforms = image_transforms
    return ds.preproc(sample)


def _our_module(proc, keep_prob=0.1):
    def qwen_process(instruction, image):
        msg = [{"role": "user",
                "content": [{"type": "image", "image": image},
                            {"type": "text", "text": instruction}]}]
        text = proc.apply_chat_template(msg, tokenize=False,
                                        add_generation_prompt=True)
        enc = proc(text=[text], images=[image], videos=None,
                   max_length=512, return_tensors="pt")
        return {"qwen_ids": np.asarray(enc["input_ids"])[0],
                "qwen_mask": np.asarray(enc["attention_mask"])[0],
                "pixel_values": np.asarray(enc["pixel_values"])[0],
                "image_grid_thw": np.asarray(enc["image_grid_thw"])[0]}

    return LightControlDataModule(DistillDataConfig(batch_size=1),
                                  qwen_process=qwen_process,
                                  caption_keep_prob=keep_prob)


def test_editing_pair_branch_matches_reference():
    rng = np.random.default_rng(0)
    sample = {"json": {"style_zh": "把它变成水彩画",
                       "caption_en": "Draw a cat"},
              "png": _images(rng), "jpg": _images(rng)}
    proc = FakeQwenProcessor()
    ref = _reference_preproc(dict(sample), proc)
    ours = _our_module(proc).preproc(dict(sample))

    np.testing.assert_array_equal(ours["qwen_ids"],
                                  np.asarray(ref["input_ids_t5"])[0])
    np.testing.assert_array_equal(ours["qwen_mask"],
                                  np.asarray(ref["attention_mask"])[0])
    # same 256^2 condition image reached the processor
    np.testing.assert_allclose(ours["pixel_values"],
                               np.asarray(ref["pixel_values"])[0],
                               atol=1e-6)
    # style target / condition / grayscale pixels (ref CHW -> NHWC)
    for ours_key, ref_key in (("style_pixels", "instance_image_style"),
                              ("cond_pixels", "instance_image"),
                              ("gray_pixels", "instance_image_L")):
        want = np.asarray(ref[ref_key]).transpose(1, 2, 0)
        got = ours[ours_key]
        if want.shape[-1] == 1:        # reference keeps L as 1 channel;
            got = got[..., :1]          # ours replicates to RGB
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_self_reconstruction_branch_matches_reference():
    rng = np.random.default_rng(1)
    sample = {"json": {"caption_en": "Paint a dog"},   # no style_zh/png
              "jpg": _images(rng)}
    proc = FakeQwenProcessor()
    ref = _reference_preproc(dict(sample), proc)        # no caption_zh ->
    ours = _our_module(proc).preproc(dict(sample))      # generic path

    np.testing.assert_array_equal(ours["qwen_ids"],
                                  np.asarray(ref["input_ids_t5"])[0])
    np.testing.assert_allclose(ours["pixel_values"],
                               np.asarray(ref["pixel_values"])[0],
                               atol=1e-6)
    assert ours["pixel_values"].shape[0] == 128        # 128^2 condition


def test_caption_dropout_instruction_forms(monkeypatch):
    """Both dropout outcomes produce the reference's exact instruction
    dicts (force each side's RNG to each branch)."""
    rng = np.random.default_rng(2)
    sample = {"json": {"caption_zh": "一只狗", "caption_en": "x"},
              "jpg": _images(rng)}
    proc = FakeQwenProcessor()
    mod = ref_loader.load_reference_datamodule("lightcontrol")

    for r, keep in ((0.95, True), (0.5, False)):
        monkeypatch.setattr(mod.random, "random", lambda r=r: r)
        ref = _reference_preproc(dict(sample), proc)
        dm = _our_module(proc)
        dm._rng.random = lambda keep=keep: 0.05 if keep else 0.5
        ours = dm.preproc(dict(sample))
        np.testing.assert_array_equal(
            ours["qwen_ids"], np.asarray(ref["input_ids_t5"])[0]), keep
