"""Real-vocab CLIP tokenizer tests: golden ids, (word:1.2) weighting, chunking,
textual-inversion embeddings, weighted encoding (sd1_clip.py parity)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.clip import (
    SD15_CLIP_CONFIG,
    TINY_CLIP_CONFIG,
    CLIPTextModel,
    Tokenizer,
    encode_token_weights,
)
from stable_renderer_tpu.models.tokenizer import (
    SDTokenizer,
    pack_chunks,
    parse_parentheses,
    token_weights,
)


@pytest.fixture(scope="module")
def tok():
    return Tokenizer(SD15_CLIP_CONFIG)


def test_golden_token_ids(tok):
    # known openai/clip-vit-large-patch14 ids for the canonical example
    ids = tok.encode("a photo of a cat")
    assert ids.shape == (77,)
    assert ids[0] == 49406 and ids[6] == 49407
    np.testing.assert_array_equal(ids[1:6], [320, 1125, 539, 320, 2368])
    # comfy pads with EOS
    assert (ids[7:] == 49407).all()


def test_parse_parentheses():
    assert parse_parentheses("a (b) c") == ["a ", "(b)", " c"]
    assert parse_parentheses("(a (b))") == ["(a (b))"]


def test_token_weights_grammar():
    out = token_weights("a (b) ((c)) (d:1.5)", 1.0)
    d = {text.strip(): w for text, w in out if text.strip()}
    assert d["a"] == 1.0
    assert d["b"] == pytest.approx(1.1)
    assert d["c"] == pytest.approx(1.21)
    assert d["d"] == pytest.approx(1.5)


def test_escaped_parens_literal(tok):
    sd = tok._sd
    plain = sd.tokenize_with_weights("a \\(cat\\)")[0]
    # all weights 1.0, and parens tokens present (not treated as weight groups)
    assert all(w == 1.0 for _, w in plain)
    weighted = sd.tokenize_with_weights("a (cat)")[0]
    assert any(w != 1.0 for _, w in weighted)


def test_long_prompt_chunks(tok):
    text = " ".join(["cat"] * 100)
    chunks = tok._sd.tokenize_with_weights(text)
    assert len(chunks) == 2
    assert all(len(c) == 77 for c in chunks)
    ids, weights, custom = tok.tokenize_weighted(text)
    assert ids.shape == (2, 77) and weights.shape == (2, 77) and custom is None


def test_textual_inversion_embedding(tmp_path, tok):
    import torch

    vec = torch.randn(2, 768)
    torch.save({"string_to_param": {"*": vec}}, tmp_path / "myembed.pt")
    sd = SDTokenizer(embedding_directory=str(tmp_path), embedding_size=768)
    chunks = sd.tokenize_with_weights("a photo of embedding:myembed")
    ids, weights, custom = pack_chunks(chunks)
    assert custom is not None and custom.shape == (2, 768)
    assert (ids < 0).sum() == 2  # two spliced vectors
    np.testing.assert_allclose(custom, vec.numpy(), rtol=1e-6)


def test_missing_embedding_ignored(tmp_path):
    sd = SDTokenizer(embedding_directory=str(tmp_path), embedding_size=768)
    chunks = sd.tokenize_with_weights("a embedding:doesnotexist cat")
    ids, _, custom = pack_chunks(chunks)
    assert custom is None and (ids >= 0).all()


def test_encode_token_weights_neutral_and_weighted():
    model = CLIPTextModel(TINY_CLIP_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    cfg = TINY_CLIP_CONFIG
    ids = np.full((1, cfg.max_length), cfg.eos_token % cfg.vocab_size, np.int32)
    ids[0, 0] = cfg.bos_token % cfg.vocab_size
    ids[0, 1:5] = [5, 6, 7, 8]
    w1 = np.ones((1, cfg.max_length), np.float32)
    z1, pooled = encode_token_weights(model, params, jnp.asarray(ids), jnp.asarray(w1))
    base = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(z1[0]), np.asarray(base[0]), atol=1e-5)
    # non-neutral weight changes the corresponding token only
    w2 = w1.copy()
    w2[0, 2] = 1.4
    z2, _ = encode_token_weights(model, params, jnp.asarray(ids), jnp.asarray(w2))
    diff = np.abs(np.asarray(z2[0] - z1[0])).sum(axis=-1)
    assert diff[2] > 1e-4 and diff[1] < 1e-5 and diff[3] < 1e-5
    assert pooled.shape == (1, cfg.hidden_size)


def test_encode_custom_embeds_path():
    model = CLIPTextModel(TINY_CLIP_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    cfg = TINY_CLIP_CONFIG
    ids = np.full((1, cfg.max_length), cfg.eos_token % cfg.vocab_size, np.int32)
    ids[0, 0] = cfg.bos_token % cfg.vocab_size
    ids[0, 1] = -1  # custom embedding slot 0
    custom = jnp.ones((1, cfg.hidden_size)) * 0.3
    out = model.apply(params, jnp.asarray(ids), custom_embeds=custom)
    assert out.shape == (1, cfg.max_length, cfg.hidden_size)
    # changing the custom vector changes the output at that position
    out2 = model.apply(params, jnp.asarray(ids), custom_embeds=custom * 2)
    assert float(jnp.abs(out2[0, 1] - out[0, 1]).sum()) > 1e-4
