"""Golden parity: our offline CLIP BPE tokenizer vs HF ``CLIPTokenizer``.

The real 49k CLIP vocab needs a download, so the test *learns* a genuine BPE
vocab from the fixture caption corpus (``experiments/json_dir``), saves it in
HF format, instantiates HF's slow ``CLIPTokenizer`` from those files, and
asserts token-id equality string-for-string — proving the algorithm (cleanup,
regex pre-tokenizer, merge loop, truncation, padding) matches bit-for-bit.
Reference tokenizer use: /root/reference/models/diffusion_prior.py:36-44.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from avi_talking_tpu.text import ClipBpeTokenizer, find_tokenizer_assets, learn_bpe
from avi_talking_tpu.text.clip_bpe import clean_text, pre_tokenize, save_vocab_files

REPO = Path(__file__).resolve().parents[1]


def fixture_captions():
    caps = []
    for f in sorted((REPO / "experiments" / "json_dir").glob("*.json")):
        caps.append(json.load(open(f))["output_texts"])
    assert caps, "fixture corpus missing"
    return caps


ADVERSARIAL = [
    "",
    "a",
    "A person's face, she'll 've 'd 'M 'T smile!!!",
    "hello   world\t\nnew  line",
    "naïve café — déjà vu…  ",
    "数字 123 mixed 中文 and english",
    "<|startoftext|> already has specials <|endoftext|>",
    "!!'s quoted 'unknown contraction",
    "emoji 😀 and ünïcödé",
    "x" * 500 + " long word " + "ab " * 200,
    "punct.,;:!?()[]{}<>#@$%^&*-_=+|\\/~`\"'",
    "MiXeD CaSe LeTTeRs",
]


@pytest.fixture(scope="module")
def learned(tmp_path_factory):
    corpus = fixture_captions()
    vocab, merges = learn_bpe(corpus, num_merges=300)
    out = tmp_path_factory.mktemp("clip_tok")
    save_vocab_files(vocab, merges, out)
    return vocab, merges, out


def test_learn_bpe_produces_real_merges(learned):
    vocab, merges, _ = learned
    assert len(merges) > 50  # corpus is repetitive, must compress well
    assert "<|startoftext|>" in vocab and "<|endoftext|>" in vocab
    assert len(vocab) == 512 + len(merges) + 2


def test_hf_roundtrip_vocab_files(learned):
    """HF CLIPTokenizer must load our generated files (format sanity)."""
    transformers = pytest.importorskip("transformers")
    _, _, out = learned
    tok = transformers.CLIPTokenizer(str(out / "vocab.json"), str(out / "merges.txt"))
    assert tok.vocab_size == len(learned[0])


def test_token_ids_match_hf_on_fixture_corpus(learned):
    transformers = pytest.importorskip("transformers")
    _, _, out = learned
    hf = transformers.CLIPTokenizer(str(out / "vocab.json"), str(out / "merges.txt"))
    ours = ClipBpeTokenizer.from_dir(out, max_length=77)
    texts = fixture_captions()
    enc = hf(texts, truncation=True, max_length=77, padding="max_length",
             return_tensors="np")["input_ids"].astype(np.int32)
    np.testing.assert_array_equal(ours(texts), enc)


def test_token_ids_match_hf_adversarial(learned):
    transformers = pytest.importorskip("transformers")
    _, _, out = learned
    hf = transformers.CLIPTokenizer(str(out / "vocab.json"), str(out / "merges.txt"))
    ours = ClipBpeTokenizer.from_dir(out, max_length=77)
    for text in ADVERSARIAL:
        want = hf([text], truncation=True, max_length=77, padding="max_length",
                  return_tensors="np")["input_ids"].astype(np.int32)
        got = ours([text])
        np.testing.assert_array_equal(got, want, err_msg=f"text={text!r}")


def test_tokenize_matches_hf_string_pieces(learned):
    """Compare the intermediate BPE pieces, not just ids, on raw strings."""
    transformers = pytest.importorskip("transformers")
    _, _, out = learned
    hf = transformers.CLIPTokenizer(str(out / "vocab.json"), str(out / "merges.txt"))
    ours = ClipBpeTokenizer.from_dir(out)
    for text in fixture_captions()[:4] + ADVERSARIAL:
        assert ours.tokenize(text) == hf.tokenize(text), text


def test_decode_roundtrip(learned):
    _, _, out = learned
    ours = ClipBpeTokenizer.from_dir(out)
    text = "a happy person speaks with raised brow"
    assert ours.decode(ours.encode(text)) == text


def test_truncation_and_padding_shape(learned):
    _, _, out = learned
    ours = ClipBpeTokenizer.from_dir(out, max_length=16)
    ids = ours(["word " * 100, "hi"])
    assert ids.shape == (2, 16)
    assert ids[0, 0] == ours.bos_id and ids[0, -1] == ours.eos_id
    # short row padded with eos
    assert (ids[1] == ours.eos_id).sum() >= 12


def test_pre_tokenize_scanner_cases():
    assert pre_tokenize("it's a test") == ["it", "'s", "a", "test"]
    assert pre_tokenize("abc123!?") == ["abc", "1", "2", "3", "!?"]
    assert pre_tokenize("!!'s x") == ["!!'", "s", "x"]  # greedy symbol run
    assert pre_tokenize("<|endoftext|>hi") == ["<|endoftext|>", "hi"]


def test_clean_text_basic():
    assert clean_text("  Hello\tWORLD\n") == "hello world"
    assert clean_text("中文abc") == "中 文 abc"
    assert clean_text("a\x00b�c") == "abc"


def test_find_assets_env(tmp_path, monkeypatch, learned):
    _, _, out = learned
    monkeypatch.setenv("AVI_TALKING_CLIP_TOKENIZER", str(out))
    assert find_tokenizer_assets() == out
    monkeypatch.setenv("AVI_TALKING_CLIP_TOKENIZER", str(tmp_path))  # empty dir
    found = find_tokenizer_assets()
    assert found != tmp_path


def test_load_tokenizer_resolution(monkeypatch, learned):
    """Pipeline resolution: real BPE when vocab fits; folded ids for tiny
    models; require_real raises on mismatch or absence."""
    from avi_talking_tpu.pipeline.generate import load_tokenizer
    from avi_talking_tpu.text import ClipBpeTokenizer

    _, _, out = learned
    monkeypatch.setenv("AVI_TALKING_CLIP_TOKENIZER", str(out))
    tok = load_tokenizer(49408, 77, require_real=True)
    assert isinstance(tok, ClipBpeTokenizer)
    # tiny model: ids folded into range, still runs
    small = load_tokenizer(99, 16)
    ids = small(["a happy person speaks"])
    assert ids.max() < 99 and ids.shape == (1, 16)
    with pytest.raises(RuntimeError):
        load_tokenizer(99, 16, require_real=True)


def test_default_vocab_fallback(monkeypatch):
    """With no vendored/env/HF vocab anywhere, load_tokenizer rides the
    PACKAGED default BPE (text/default_vocab, learned over the caption
    corpus) with NO hash-fallback warning; require_real still refuses it
    (imported CLIP weights need the exact OpenAI vocab)."""
    import warnings

    from avi_talking_tpu.pipeline import generate as G
    from avi_talking_tpu.text import ClipBpeTokenizer

    monkeypatch.delenv("AVI_TALKING_CLIP_TOKENIZER", raising=False)
    monkeypatch.setattr(
        "avi_talking_tpu.text.find_tokenizer_assets",
        lambda explicit=None: None)
    # sever the HF local-cache path too
    import transformers

    monkeypatch.setattr(
        transformers.CLIPTokenizer, "from_pretrained",
        classmethod(lambda cls, *a, **k: (_ for _ in ()).throw(OSError())))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        tok = G.load_tokenizer(49408, 77)
    assert isinstance(tok, ClipBpeTokenizer)
    ids = tok(["A fairly angry man speaks with brow fairly down"])
    assert ids.shape == (1, 77) and ids.max() < tok.vocab_size
    # proper BPE: different captions -> different ids
    ids2 = tok(["A happy person speaks with raised cheeks"])
    assert not (ids == ids2).all()
    # tiny configs fold ids into range
    small = G.load_tokenizer(64, 16)
    assert small(["hello there"]).max() < 64
    # real weights still demand the real vocab
    with pytest.raises(RuntimeError):
        G.load_tokenizer(49408, 77, require_real=True)


def test_validate_tokenizer_assets(learned, tmp_path):
    """Layout validation: good pair passes; corrupted layouts are refused
    (specials misplaced / missing byte symbols / id gaps)."""
    import json as _json

    from avi_talking_tpu.text.clip_bpe import validate_tokenizer_assets

    _, _, out = learned
    tok = validate_tokenizer_assets(out)
    n_merges = len((out / "merges.txt").read_text().strip().split("\n")) - 1
    assert tok.vocab_size == 512 + n_merges + 2

    # specials misplaced
    bad = tmp_path / "bad1"
    bad.mkdir()
    v = _json.loads((out / "vocab.json").read_text())
    v["<|startoftext|>"], v["a"] = v["a"], v["<|startoftext|>"]
    (bad / "vocab.json").write_text(_json.dumps(v))
    (bad / "merges.txt").write_text((out / "merges.txt").read_text())
    with pytest.raises(ValueError, match="specials"):
        validate_tokenizer_assets(bad)

    # id gap
    bad2 = tmp_path / "bad2"
    bad2.mkdir()
    v2 = _json.loads((out / "vocab.json").read_text())
    some_regular = next(k for k in v2 if not k.startswith("<|") and v2[k] < 500)
    v2[some_regular] = len(v2) + 100
    (bad2 / "vocab.json").write_text(_json.dumps(v2))
    (bad2 / "merges.txt").write_text((out / "merges.txt").read_text())
    with pytest.raises(ValueError):
        validate_tokenizer_assets(bad2)


def test_cli_import_clip_from_hf_cache(learned, tmp_path, capsys):
    """cli import-clip: finds the pair inside a simulated HF hub cache,
    validates, copies to the asset slot; load_tokenizer then runs with NO
    hash-fallback warning."""
    import shutil
    import warnings

    from avi_talking_tpu.cli import main
    from avi_talking_tpu.pipeline.generate import load_tokenizer
    from avi_talking_tpu.text import ClipBpeTokenizer

    _, _, out = learned
    cache = tmp_path / "hf" / "hub"
    snap = cache / "models--openai--clip-vit-large-patch14" / "snapshots" / "abc123"
    snap.mkdir(parents=True)
    for fn in ("vocab.json", "merges.txt"):
        shutil.copyfile(out / fn, snap / fn)

    dest = tmp_path / "assets" / "clip_tokenizer"
    rc = main(["import-clip", "--src", str(tmp_path / "hf"),
               "--dest", str(dest)])
    assert rc == 0
    assert "validated + vendored" in capsys.readouterr().out
    assert (dest / "vocab.json").is_file() and (dest / "merges.txt").is_file()

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any fallback warning -> failure
        tok = load_tokenizer(49408, 77, assets_dir=dest, require_real=True)
    assert isinstance(tok, ClipBpeTokenizer)

    # with real weights and no vocab anywhere it refuses loudly
    with pytest.raises(FileNotFoundError):
        main(["import-clip", "--src", str(tmp_path / "empty_nowhere")])
