"""Tokenizer parity tests (VERDICT round-1 missing #2 / weak #6).

* T5 Unigram: our pure-python Viterbi vs the `tokenizers` library's
  Unigram model (the exact engine behind the reference's T5TokenizerFast,
  train_promptdiffusion_sd3.py:871-906) on a synthetic vocab, plus the
  spiece.model protobuf parser round-trip.
* CLIP BPE: our tokenizer vs `transformers.CLIPTokenizer` on synthetic
  vocab/merges assets (the reference tokenizes through CLIPTokenizer,
  ldm/modules/encoders/modules.py:95).
* load_tokenizer must warn loudly when falling back to HashTokenizer.
"""

import json
import struct

import numpy as np
import pytest

from prompt_diffusion_tpu.data.t5_tokenizer import (
    EOS_ID,
    PAD_ID,
    T5Tokenizer,
    _parse_spiece_model,
)
from prompt_diffusion_tpu.data.tokenizer import CLIPTokenizer, load_tokenizer

# --- synthetic T5/Unigram vocab ---------------------------------------------

T5_VOCAB = [
    ("<pad>", 0.0),
    ("</s>", 0.0),
    ("<unk>", 0.0),
    ("▁", -2.0),
    ("▁the", -1.5),
    ("▁cat", -2.5),
    ("▁sat", -2.75),
    ("▁on", -1.25),
    ("▁mat", -2.5),
    ("▁c", -4.0),
    ("at", -3.0),
    ("▁s", -4.25),
    ("▁m", -4.5),
    ("s", -5.0),
    ("a", -5.0),
    ("t", -5.0),
    ("c", -5.5),
    ("m", -5.5),
    ("o", -5.0),
    ("n", -5.0),
    ("h", -5.25),
    ("e", -5.25),
    ("▁t", -4.0),
    ("he", -3.5),
    ("▁do", -3.0),
    ("g", -5.5),
]

T5_SENTENCES = [
    "the cat sat on the mat",
    "the dog",  # needs per-char composition
    "cats",  # suffix fallback
    "the  cat",  # space-run collapsing (T5 Replace normalizer)
    "  the   cat  ",  # leading/trailing spaces
    " the ",  # trailing space → lone ▁ token
    "\tthe\ncat",  # tab/newline are NOT split chars — raw lattice input
    "the qat",  # q is OOV → unk
    "qq zz",  # consecutive unks fuse
]


@pytest.fixture(scope="module")
def hf_unigram():
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Regex, Tokenizer, models, normalizers, pre_tokenizers

    tok = Tokenizer(models.Unigram(T5_VOCAB, unk_id=2, byte_fallback=False))
    # T5TokenizerFast's normalizer = Precompiled charsmap (NFKC-ish; ASCII
    # no-op) + this Replace — we replicate the Replace
    tok.normalizer = normalizers.Replace(Regex(" {2,}"), " ")
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always", split=True
    )
    return tok


def test_t5_unigram_matches_tokenizers_lib(hf_unigram):
    ours = T5Tokenizer(T5_VOCAB)
    for s in T5_SENTENCES:
        theirs = hf_unigram.encode(s).ids
        assert ours.encode_text(s) == theirs, f"mismatch on {s!r}"
    assert ours.encode_text("") == []


def test_t5_call_padding_and_eos():
    ours = T5Tokenizer(T5_VOCAB)
    out = ours(["the cat", ""], max_length=8)
    assert out.shape == (2, 8)
    row = list(out[0])
    assert EOS_ID in row
    assert row[row.index(EOS_ID) + 1 :] == [PAD_ID] * (7 - row.index(EOS_ID))
    assert list(out[1]) == [EOS_ID] + [PAD_ID] * 7


def test_spiece_protobuf_parser(tmp_path):
    """Serialize a minimal sentencepiece ModelProto by hand; the parser must
    recover (piece, score) pairs exactly."""

    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def piece_msg(piece, score, ptype=None):
        body = b"\x0a" + varint(len(piece.encode())) + piece.encode()
        body += b"\x15" + struct.pack("<f", score)
        if ptype is not None:
            body += b"\x18" + varint(ptype)
        return b"\x0a" + varint(len(body)) + body

    blob = b"".join(
        piece_msg(p, s, ptype=(2 if p == "<unk>" else 3 if p.startswith("<") else None))
        for p, s in T5_VOCAB[:8]
    )
    # trailing unknown field (e.g. trainer_spec) must be skipped
    blob += b"\x12" + varint(3) + b"abc"
    path = tmp_path / "spiece.model"
    path.write_bytes(blob)
    assert _parse_spiece_model(str(path)) == T5_VOCAB[:8]

    tok = T5Tokenizer.load(str(tmp_path))
    assert tok.encode_text("the") == [T5_VOCAB.index(("▁the", -1.5))]


# --- CLIP BPE vs transformers -------------------------------------------------

CLIP_WORDS = ["a", "cat", "sat", "on", "the", "mat", "photo", "of"]


@pytest.fixture(scope="module")
def clip_assets(tmp_path_factory):
    """Synthetic CLIP vocab: all byte-level chars + </w> forms + merges that
    build the test words, in HF CLIPTokenizer format."""
    from prompt_diffusion_tpu.data.tokenizer import _bytes_to_unicode

    chars = sorted(set(_bytes_to_unicode().values()))
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    merges = []

    def add_merges_for(word):
        # left-to-right merges: (w0 w1), (w0w1 w2), ... last with </w>
        parts = list(word[:-1]) + [word[-1] + "</w>"]
        while len(parts) > 1:
            pair = (parts[0], parts[1])
            if pair not in merges:
                merges.append(pair)
            merged = parts[0] + parts[1]
            if merged not in vocab:
                vocab[merged] = len(vocab)
            parts = [merged] + parts[2:]

    for w in CLIP_WORDS:
        add_merges_for(w)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    d = tmp_path_factory.mktemp("clip_assets")
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n"
    )
    return d


def test_clip_bpe_matches_transformers(clip_assets):
    transformers = pytest.importorskip("transformers")

    hf = transformers.CLIPTokenizer(
        str(clip_assets / "vocab.json"), str(clip_assets / "merges.txt")
    )
    ours = CLIPTokenizer(str(clip_assets / "vocab.json"), str(clip_assets / "merges.txt"))
    prompts = [
        "a photo of the cat",
        "the cat sat on the mat",
        "CAT ON MAT",  # lowercasing
        "a  cat   sat",  # whitespace
        "catsat",  # merge boundaries inside an unknown-ish word
        "café in münchen",  # non-ASCII letters must stay in the WORD branch
        "日本 cat",  # CJK through the byte-level encoder
        "",
    ]
    for p in prompts:
        theirs = hf(p, padding="max_length", max_length=77)["input_ids"]
        mine = ours([p], max_length=77)[0].tolist()
        assert mine == theirs, f"mismatch on {p!r}"


def test_openclip_pack_matches_openclip_tokenize(clip_assets):
    """openclip_pack=True vs a faithful restatement of `open_clip.tokenize`
    (the packing FrozenOpenCLIPEmbedder feeds its text tower,
    /root/reference/ldm/modules/encoders/modules.py:169): zero padding,
    truncate-to-context-then-force-eot. BPE ids come from HF CLIPTokenizer
    (same BPE table as open_clip's SimpleTokenizer), so this isolates the
    PACKING semantics — the id parity itself is covered above."""
    transformers = pytest.importorskip("transformers")
    import numpy as np

    hf = transformers.CLIPTokenizer(
        str(clip_assets / "vocab.json"), str(clip_assets / "merges.txt")
    )
    ours = CLIPTokenizer(str(clip_assets / "vocab.json"), str(clip_assets / "merges.txt"))
    sot, eot = ours.sot, ours.eot

    def openclip_tokenize(texts, context_length=77):
        # restatement of open_clip.tokenize (open_clip/tokenizer.py)
        result = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            content = hf(text)["input_ids"][1:-1]  # strip HF's sot/eot
            tokens = [sot] + content + [eot]
            if len(tokens) > context_length:
                tokens = tokens[:context_length]
                tokens[-1] = eot
            result[i, : len(tokens)] = tokens
        return result

    prompts = [
        "a photo of the cat",
        "the cat sat on the mat",
        "",
        "cat " * 100,  # truncation path
    ]
    np.testing.assert_array_equal(
        ours(prompts, max_length=77, openclip_pack=True),
        openclip_tokenize(prompts),
    )
    # default packing is unchanged (eot padding)
    assert ours(["a cat"], max_length=8)[0].tolist()[-1] == eot


def test_added_tokens_whole_word_only(clip_assets):
    """Textual-inversion placeholders must replace WHOLE tokens only
    (diffusers TextualInversionLoaderMixin semantics): 'cat' registered
    as a placeholder must fire in 'a cat sat' but NOT inside 'catsat'."""
    ours = CLIPTokenizer(str(clip_assets / "vocab.json"), str(clip_assets / "merges.txt"))
    plain_catsat = ours.encode_text("catsat")
    plain_sat = ours.encode_text("sat")
    ours.add_tokens({"cat": [49408, 49409]})  # multi-vector TI
    # whole word → the two TI ids replace the word
    assert ours.encode_text("cat sat") == [49408, 49409] + plain_sat
    # substring inside a longer word → untouched BPE encoding
    assert ours.encode_text("catsat") == plain_catsat
    # case-insensitive (prompt is lowercased by _basic_clean)
    assert ours.encode_text("CAT") == [49408, 49409]


def test_load_tokenizer_warns_on_hash_fallback(tmp_path):
    with pytest.warns(UserWarning, match="HashTokenizer"):
        load_tokenizer(str(tmp_path))
    with pytest.warns(UserWarning, match="HashTokenizer"):
        load_tokenizer(None)
