"""CLIP tower parity (vs transformers.CLIPModel) + tokenizer + loss wiring.

The reference uses pip `clip` ViT-B/16 (cliploss.py:43); HuggingFace's
CLIPModel implements the same architecture and serves as a random-init
numerical oracle here. The OpenAI-layout converter is validated by
synthesizing an OpenAI-style state dict from the same HF weights.
"""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from dsml_thesis_tpu.models import clip as jclip
from dsml_thesis_tpu.data.clip_tokenizer import CLIPTokenizer, bytes_to_unicode


def _tiny_hf_clip(seed=0):
    cfg = transformers.CLIPConfig(
        text_config={
            "hidden_size": 64, "intermediate_size": 256,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "vocab_size": 96, "max_position_embeddings": 16,
            "hidden_act": "quick_gelu", "eos_token_id": 95,
            "bos_token_id": 94, "pad_token_id": 0,
        },
        vision_config={
            "hidden_size": 48, "intermediate_size": 192,
            "num_hidden_layers": 2, "num_attention_heads": 3,
            "image_size": 32, "patch_size": 8, "hidden_act": "quick_gelu",
        },
        projection_dim=32,
    )
    torch.manual_seed(seed)
    return transformers.CLIPModel(cfg).eval()


def _tokens(rs, n=3, l=10, vocab=96, eot=95):
    """sot + random ids + eot + zero pad, eot is the max id (argmax pooling)."""
    t = np.zeros((n, 16), np.int32)
    for i in range(n):
        k = rs.randint(3, l)
        t[i, 0] = 94
        t[i, 1:k] = rs.randint(1, 90, size=k - 1)
        t[i, k] = eot
    return t


def test_clip_parity_vs_hf():
    tm = _tiny_hf_clip()
    cfg, params = jclip.convert_clip_hf(tm.state_dict(), vision_heads=3,
                                        text_heads=4)
    assert cfg.vision_layers == 2 and cfg.text_layers == 2
    rs = np.random.RandomState(0)
    imgs = rs.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1
    toks = _tokens(rs, n=2)
    with torch.no_grad():
        ref_img = tm.get_image_features(torch.from_numpy(imgs)).numpy()
        ref_txt = tm.get_text_features(
            torch.from_numpy(toks.astype(np.int64))
        ).numpy()

    img = jclip.CLIPVisionTower(cfg).apply(
        {"params": params["visual"]}, jnp.asarray(imgs.transpose(0, 2, 3, 1))
    )
    txt = jclip.CLIPTextTower(cfg).apply(
        {"params": params["text"]}, jnp.asarray(toks)
    )
    np.testing.assert_allclose(np.asarray(img), ref_img, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(txt), ref_txt, atol=1e-4, rtol=1e-3)


def _hf_to_openai_sd(tm):
    """Re-key HF CLIPModel weights into the OpenAI `clip` checkpoint layout."""
    sd = tm.state_dict()
    out = {}

    def blocks(src, dst, n):
        for i in range(n):
            s, d = f"{src}.encoder.layers.{i}", f"{dst}.resblocks.{i}"
            out[f"{d}.attn.in_proj_weight"] = torch.cat(
                [sd[f"{s}.self_attn.{p}_proj.weight"] for p in "qkv"], dim=0)
            out[f"{d}.attn.in_proj_bias"] = torch.cat(
                [sd[f"{s}.self_attn.{p}_proj.bias"] for p in "qkv"], dim=0)
            out[f"{d}.attn.out_proj.weight"] = sd[f"{s}.self_attn.out_proj.weight"]
            out[f"{d}.attn.out_proj.bias"] = sd[f"{s}.self_attn.out_proj.bias"]
            out[f"{d}.ln_1.weight"] = sd[f"{s}.layer_norm1.weight"]
            out[f"{d}.ln_1.bias"] = sd[f"{s}.layer_norm1.bias"]
            out[f"{d}.ln_2.weight"] = sd[f"{s}.layer_norm2.weight"]
            out[f"{d}.ln_2.bias"] = sd[f"{s}.layer_norm2.bias"]
            out[f"{d}.mlp.c_fc.weight"] = sd[f"{s}.mlp.fc1.weight"]
            out[f"{d}.mlp.c_fc.bias"] = sd[f"{s}.mlp.fc1.bias"]
            out[f"{d}.mlp.c_proj.weight"] = sd[f"{s}.mlp.fc2.weight"]
            out[f"{d}.mlp.c_proj.bias"] = sd[f"{s}.mlp.fc2.bias"]

    blocks("vision_model", "visual.transformer", 2)
    blocks("text_model", "transformer", 2)
    out["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    out["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    out["visual.positional_embedding"] = sd[
        "vision_model.embeddings.position_embedding.weight"]
    out["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    out["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    out["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    out["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    out["visual.proj"] = sd["visual_projection.weight"].t()
    out["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    out["positional_embedding"] = sd["text_model.embeddings.position_embedding.weight"]
    out["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    out["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    out["text_projection"] = sd["text_projection.weight"].t()
    return out


def test_openai_layout_converter_matches_hf_converter():
    tm = _tiny_hf_clip(1)
    cfg_hf, p_hf = jclip.convert_clip_hf(tm.state_dict(), 3, 4)
    cfg_oa, p_oa = jclip.convert_clip_openai(_hf_to_openai_sd(tm), 3, 4)
    assert cfg_hf == cfg_oa
    flat_hf = jax.tree_util.tree_leaves_with_path(p_hf)
    flat_oa = dict(jax.tree_util.tree_leaves_with_path(p_oa))
    # keys not in the openai archive naturally absent: none — same tree
    assert len(flat_hf) == len(flat_oa)
    for path, v in flat_hf:
        np.testing.assert_array_equal(v, flat_oa[path], err_msg=str(path))


def test_preprocess_and_embed_fn_differentiable():
    tm = _tiny_hf_clip(2)
    cfg, params = jclip.convert_clip_hf(tm.state_dict(), 3, 4)
    embed = jclip.make_clip_image_embed(cfg, params["visual"])
    rs = np.random.RandomState(3)
    imgs = jnp.asarray(rs.rand(2, 24, 24, 3).astype(np.float32) * 2 - 1)
    e = embed(imgs)
    assert e.shape == (2, 32)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(e, axis=-1)), 1.0, atol=1e-5
    )

    from dsml_thesis_tpu.losses.guidance import clip_directional_loss

    rs2 = np.random.RandomState(4)
    tdir = jnp.asarray(rs2.randn(32).astype(np.float32))
    g = jax.grad(
        lambda im: clip_directional_loss(embed, imgs, im, tdir)
    )(imgs + 0.01)
    assert float(jnp.abs(g).max()) > 0


def test_compute_text_direction():
    tm = _tiny_hf_clip(5)
    cfg, params = jclip.convert_clip_hf(tm.state_dict(), 3, 4)
    rs = np.random.RandomState(6)
    src, trg = _tokens(rs, n=4), _tokens(rs, n=4)
    d = jclip.compute_text_direction(cfg, params["text"],
                                     jnp.asarray(src), jnp.asarray(trg))
    assert d.shape == (32,)
    assert float(jnp.linalg.norm(d)) == pytest.approx(1.0, abs=1e-5)

    # oracle: same math through HF features
    with torch.no_grad():
        fs = tm.get_text_features(torch.from_numpy(src.astype(np.int64)))
        ft = tm.get_text_features(torch.from_numpy(trg.astype(np.int64)))
    fs = fs / fs.norm(dim=-1, keepdim=True)
    ft = ft / ft.norm(dim=-1, keepdim=True)
    ref = (ft - fs).mean(dim=0)
    ref = (ref / ref.norm()).numpy()
    np.testing.assert_allclose(np.asarray(d), ref, atol=1e-4)


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

def _synthetic_merges():
    """A small but real merge table over ASCII word pieces."""
    return [
        "t h", "th e</w>", "f a", "fa c", "fac e</w>", "h a",
        "ha p", "hap p", "happ y</w>", "p h", "ph o", "pho t", "phot o</w>",
        "o f</w>", "s a", "sa d</w>", "a n", "an g", "ang r", "angr y</w>",
    ]


def test_tokenizer_matches_transformers(tmp_path):
    merges = _synthetic_merges()
    tok = CLIPTokenizer(merges)

    # build the HF vocab.json exactly as the CLIP vocab is constructed
    vocab = list(bytes_to_unicode().values())
    vocab += [v + "</w>" for v in vocab]
    vocab += ["".join(m.split()) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    (tmp_path / "vocab.json").write_text(
        json.dumps({t: i for i, t in enumerate(vocab)})
    )
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(merges) + "\n"
    )
    hf = transformers.CLIPTokenizer(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    )

    # NB: no HTML-escape cases — ours follows OpenAI clip (html.unescape x2),
    # while ftfy-less transformers falls back to BasicTokenizer cleanup.
    for text in ["a photo of a happy face.", "THE SAD face!", "angry  face",
                 "face", "xyzzy, q-t: 7"]:
        ours = tok.encode(text)
        ref = hf(text)["input_ids"][1:-1]  # strip sot/eot
        assert ours == ref, text


def test_tokenize_shapes_and_special_tokens():
    tok = CLIPTokenizer(_synthetic_merges())
    arr = tok.tokenize(["a happy face", "sad face"], context_length=12)
    assert arr.shape == (2, 12)
    sot, eot = tok.encoder["<|startoftext|>"], tok.encoder["<|endoftext|>"]
    assert (arr[:, 0] == sot).all()
    for row in arr:
        nz = row[row > 0]
        assert nz[-1] == eot
    # eot is the max id -> argmax pooling lands on it
    assert arr.argmax(-1).tolist() == [
        int(np.where(r == eot)[0][0]) for r in arr
    ]
    # roundtrip
    assert tok.decode(tok.encode("a happy face")) == "a happy face"


def test_text_direction_identical_prompts_is_finite_zero():
    # contempt (label 7) has no reference edit text, so src == trg prompts;
    # the direction must degrade to an exact zero row, not 0/0 = NaN
    tm = _tiny_hf_clip(5)
    cfg, params = jclip.convert_clip_hf(tm.state_dict(), 3, 4)
    rs = np.random.RandomState(9)
    src = _tokens(rs, n=4)
    d = jclip.compute_text_direction(cfg, params["text"],
                                     jnp.asarray(src), jnp.asarray(src))
    assert np.all(np.isfinite(np.asarray(d)))
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)

    from dsml_thesis_tpu.losses.guidance import clip_directional_loss

    embed = lambda im: jnp.ones((im.shape[0], d.shape[0]))
    imgs = jnp.zeros((2, 8, 8, 3))
    g = jax.grad(
        lambda im: clip_directional_loss(embed, imgs, im, d)
    )(imgs)
    assert np.all(np.isfinite(np.asarray(g)))

def test_bicubic_resize_matches_torch_exactly():
    """preprocess_gan_output's resize must be TORCH bicubic (cubic kernel
    a=-0.75, half-pixel centers, no antialias) — jax.image.resize 'cubic'
    is Catmull-Rom (a=-0.5) and differs by up to ~0.1 in [0,1] units."""
    import torch
    import torch.nn.functional as F

    from dsml_thesis_tpu.models.clip import bicubic_resize_torch

    rng = np.random.RandomState(0)
    for (h, w, oh, ow) in [(64, 64, 224, 224), (256, 256, 224, 224),
                           (128, 96, 224, 224), (224, 224, 64, 48)]:
        x = rng.rand(2, h, w, 3).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(oh, ow),
            mode="bicubic", align_corners=False, antialias=False,
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(bicubic_resize_torch(jnp.asarray(x), oh, ow))
        assert np.abs(got - ref).max() < 1e-4, (h, w, oh, ow)


def test_load_clip_checkpoint_forwards_quick_gelu(tmp_path):
    """HF plain-GELU checkpoints (LAION lineage) must be loadable with
    use_quick_gelu=False through the file entry point — the state_dict
    alone cannot tell the activations apart."""
    import torch

    tm = _tiny_hf_clip()
    p = tmp_path / "clip.pt"
    torch.save(tm.state_dict(), str(p))
    from dsml_thesis_tpu.models.clip import load_clip_checkpoint

    cfg_q, _ = load_clip_checkpoint(str(p))
    cfg_g, _ = load_clip_checkpoint(str(p), use_quick_gelu=False)
    assert cfg_q.use_quick_gelu and not cfg_g.use_quick_gelu
