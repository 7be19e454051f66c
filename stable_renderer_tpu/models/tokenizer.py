"""CLIP BPE tokenization with prompt weighting + textual-inversion embeddings.

Capability match for the reference's SDTokenizer stack
(reference: comfy/sd1_clip.py:208-484 — parse_parentheses :208, token_weights
:229, escape_important :249, load_embed :286, SDTokenizer.tokenize_with_weights
:400-484). The BPE itself is transformers' CLIPTokenizer loaded from the
bundled vocab files (`assets/clip_tokenizer/`), exactly as the reference loads
its `sd1_tokenizer/` directory via `CLIPTokenizer.from_pretrained`.

Weighting grammar: ``(word)`` multiplies weight by 1.1 per nesting level,
``(word:1.3)`` sets it explicitly, ``\\(`` / ``\\)`` escape literal parens.
``embedding:name`` words load a textual-inversion vector from the embedding
directory (safetensors / torch .pt) and splice it into the token stream.

Output contract (per prompt): a list of 77-token chunks, each a list of
``(token_id_or_vector, weight)`` pairs with BOS/EOS and EOS-padding (SD1.x) or
0-padding (SDXL clip-g style, ``pad_with_end=False``).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from stable_renderer_tpu.utils.log import get_logger

logger = get_logger("sr_tpu.tokenizer")

ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets", "clip_tokenizer")

TokenItem = Tuple[Union[int, np.ndarray], float]


def parse_parentheses(string: str) -> List[str]:
    """Split into top-level segments, keeping parenthesized groups intact
    (sd1_clip.py:208-227 semantics)."""
    result = []
    current = ""
    depth = 0
    for char in string:
        if char == "(":
            if depth == 0 and current:
                result.append(current)
                current = ""
            current += char
            depth += 1
        elif char == ")":
            depth -= 1
            current += char
            if depth == 0:
                result.append(current)
                current = ""
        else:
            current += char
    if current:
        result.append(current)
    return result


def token_weights(string: str, current_weight: float) -> List[Tuple[str, float]]:
    """Recursive (text, weight) expansion: nesting multiplies by 1.1, a trailing
    ``:N`` inside parens sets the weight explicitly (sd1_clip.py:229-247)."""
    out: List[Tuple[str, float]] = []
    for x in parse_parentheses(string):
        weight = current_weight
        if len(x) >= 2 and x[-1] == ")" and x[0] == "(":
            x = x[1:-1]
            xx = x.rfind(":")
            weight *= 1.1
            if xx > 0:
                try:
                    weight = float(x[xx + 1:])
                    x = x[:xx]
                except ValueError:
                    pass
            out += token_weights(x, weight)
        else:
            out.append((x, current_weight))
    return out


def escape_important(text: str) -> str:
    return text.replace("\\)", "\0\1").replace("\\(", "\0\2")


def unescape_important(text: str) -> str:
    return text.replace("\0\1", ")").replace("\0\2", "(")


def load_embed(
    embedding_name: str,
    embedding_directory: Union[str, Sequence[str], None],
    embedding_size: int,
    embed_key: Optional[str] = None,
) -> Optional[np.ndarray]:
    """Load a textual-inversion embedding as (n_vectors, embedding_size) f32.

    Supports .safetensors and torch .pt/.bin payloads with the usual layouts:
    raw tensor, {'string_to_param': {'*': t}}, {'emb_params': t}, or per-key
    dicts {'clip_l': t, 'clip_g': t} (sd1_clip.py:286-356 semantics).
    """
    if embedding_directory is None:
        return None
    if isinstance(embedding_directory, (str, os.PathLike)):
        embedding_directory = [str(embedding_directory)]

    valid_file = None
    for embed_dir in embedding_directory:
        embed_dir = os.path.abspath(embed_dir)
        embed_path = os.path.abspath(os.path.join(embed_dir, embedding_name))
        try:
            if os.path.commonpath((embed_dir, embed_path)) != embed_dir:
                continue  # path traversal guard, as in the reference
        except ValueError:
            continue
        if os.path.isfile(embed_path):
            valid_file = embed_path
        else:
            for ext in (".safetensors", ".pt", ".bin"):
                if os.path.isfile(embed_path + ext):
                    valid_file = embed_path + ext
                    break
        if valid_file:
            break
    if valid_file is None:
        return None

    try:
        if valid_file.endswith(".safetensors"):
            from safetensors import safe_open

            embed = {}
            with safe_open(valid_file, framework="np") as f:
                for k in f.keys():
                    embed[k] = np.asarray(f.get_tensor(k))
        else:
            import torch

            data = torch.load(valid_file, map_location="cpu", weights_only=False)
            embed = {}
            if isinstance(data, dict):
                if "string_to_param" in data:
                    data = data["string_to_param"]
                for k, v in data.items():
                    if hasattr(v, "numpy"):
                        embed[k] = v.detach().float().numpy()
                    elif isinstance(v, np.ndarray):
                        embed[k] = v
            elif hasattr(data, "numpy"):
                embed = {"emb_params": data.detach().float().numpy()}
    except Exception as e:  # corrupt file: warn and skip, like the reference
        logger.warning(f"could not load embedding {valid_file}: {e}")
        return None

    values = None
    if embed_key is not None and embed_key in embed:
        values = embed[embed_key]
    elif "emb_params" in embed:
        values = embed["emb_params"]
    elif "*" in embed:
        values = embed["*"]
    elif len(embed) == 1:
        values = next(iter(embed.values()))
    else:
        # multi-key dict: pick the entry matching the embedding size
        for v in embed.values():
            if v.ndim and v.shape[-1] == embedding_size:
                values = v
                break
    if values is None:
        return None
    values = np.asarray(values, np.float32)
    if values.ndim == 1:
        values = values[None]
    if values.shape[-1] != embedding_size:
        logger.warning(
            f"embedding {embedding_name} has dim {values.shape[-1]}, expected {embedding_size}; ignoring"
        )
        return None
    return values


class SDTokenizer:
    """Reference-parity prompt tokenizer (sd1_clip.py:358-484).

    ``tokenize_with_weights`` returns a list of 77-long chunks of
    (token_id | np.ndarray embedding vector, weight) pairs. Words longer than
    ``max_word_length`` tokens may split across chunks; shorter words wrap
    whole to the next chunk.
    """

    def __init__(
        self,
        tokenizer_path: Optional[str] = None,
        max_length: int = 77,
        pad_with_end: bool = True,
        embedding_directory: Union[str, Sequence[str], None] = None,
        embedding_size: int = 768,
        embedding_key: str = "clip_l",
        pad_to_max_length: bool = True,
    ):
        from transformers import CLIPTokenizer

        self.tokenizer = CLIPTokenizer.from_pretrained(tokenizer_path or ASSET_DIR)
        self.max_length = max_length
        empty = self.tokenizer("")["input_ids"]
        self.start_token = empty[0]
        self.end_token = empty[1]
        self.pad_with_end = pad_with_end
        self.pad_to_max_length = pad_to_max_length
        self.embedding_directory = embedding_directory
        self.max_word_length = 8
        self.embedding_identifier = "embedding:"
        self.embedding_size = embedding_size
        self.embedding_key = embedding_key
        inv = {v: k for k, v in self.tokenizer.get_vocab().items()}
        self.inv_vocab = inv

    def _try_get_embedding(self, name: str):
        embed = load_embed(name, self.embedding_directory, self.embedding_size, self.embedding_key)
        if embed is None:
            stripped = name.strip(",")
            if len(stripped) < len(name):
                embed = load_embed(
                    stripped, self.embedding_directory, self.embedding_size, self.embedding_key
                )
                return embed, name[len(stripped):]
        return embed, ""

    def tokenize_with_weights(self, text: str, return_word_ids: bool = False):
        pad_token = self.end_token if self.pad_with_end else 0
        text = escape_important(text)
        parsed_weights = token_weights(text, 1.0)

        # tokenize words -> list of [(id|vec, weight), ...] groups
        tokens: List[List[TokenItem]] = []
        for weighted_segment, weight in parsed_weights:
            to_tokenize = [
                w for w in unescape_important(weighted_segment).replace("\n", " ").split(" ") if w
            ]
            for word in to_tokenize:
                if word.startswith(self.embedding_identifier) and self.embedding_directory is not None:
                    embedding_name = word[len(self.embedding_identifier):].strip("\n")
                    embed, leftover = self._try_get_embedding(embedding_name)
                    if embed is None:
                        logger.warning(f"embedding:{embedding_name} does not exist, ignoring")
                    else:
                        tokens.append([(embed[x], weight) for x in range(embed.shape[0])])
                    if leftover:
                        word = leftover
                    else:
                        continue
                ids = self.tokenizer(word)["input_ids"][1:-1]
                tokens.append([(t, weight) for t in ids])

        # pack into max_length chunks with BOS/EOS (+pad), reference chunking rules
        batched: List[List[Tuple[Union[int, np.ndarray], float, int]]] = []
        batch: List[Tuple[Union[int, np.ndarray], float, int]] = [(self.start_token, 1.0, 0)]
        batched.append(batch)
        for i, t_group in enumerate(tokens):
            is_large = len(t_group) >= self.max_word_length
            while len(t_group) > 0:
                if len(t_group) + len(batch) > self.max_length - 1:
                    remaining = self.max_length - len(batch) - 1
                    if is_large:
                        batch.extend([(t, w, i + 1) for t, w in t_group[:remaining]])
                        batch.append((self.end_token, 1.0, 0))
                        t_group = t_group[remaining:]
                    else:
                        batch.append((self.end_token, 1.0, 0))
                        if self.pad_to_max_length:
                            batch.extend([(pad_token, 1.0, 0)] * remaining)
                    batch = [(self.start_token, 1.0, 0)]
                    batched.append(batch)
                else:
                    batch.extend([(t, w, i + 1) for t, w in t_group])
                    t_group = []

        batch.append((self.end_token, 1.0, 0))
        if self.pad_to_max_length:
            batch.extend([(pad_token, 1.0, 0)] * (self.max_length - len(batch)))

        if not return_word_ids:
            return [[(t, w) for t, w, _ in x] for x in batched]
        return batched

    def untokenize(self, token_weight_pairs):
        return [(self.inv_vocab.get(t, t), w) for t, w in token_weight_pairs if isinstance(t, int)]


def pack_chunks(
    chunks: List[List[TokenItem]],
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Convert tokenize_with_weights output into fixed arrays for the encoder.

    Returns (ids (n_chunks, L) int32, weights (n_chunks, L) f32,
    custom_embeds (K, D) f32 or None). Textual-inversion vectors are replaced
    by negative ids -(k+1) indexing into custom_embeds — the jit-friendly
    equivalent of sd1_clip.py:125-162 set_up_textual_embeddings.
    """
    n = len(chunks)
    length = len(chunks[0]) if n else 0
    ids = np.zeros((n, length), np.int32)
    weights = np.ones((n, length), np.float32)
    custom: List[np.ndarray] = []
    for ci, chunk in enumerate(chunks):
        for ti, (tok, w) in enumerate(chunk):
            if isinstance(tok, np.ndarray):
                custom.append(np.asarray(tok, np.float32))
                ids[ci, ti] = -len(custom)
            else:
                ids[ci, ti] = int(tok)
            weights[ci, ti] = float(w)
    custom_arr = np.stack(custom) if custom else None
    return ids, weights, custom_arr
