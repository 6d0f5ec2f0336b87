"""G2PW polyphone classifier: torch parity + predictor pipeline."""
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from easevoice_trainer_tpu.models.bert import BertConfig
from easevoice_trainer_tpu.text import g2pw as jg

TINY_BERT = dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                 num_attention_heads=2, intermediate_size=64,
                 max_position_embeddings=64, type_vocab_size=2)
N_LABELS, N_CHARS = 7, 3


class TorchG2PW(torch.nn.Module):
    """The head the JAX module implements: BERT -> gather -> conditional
    weighted softmax (g2pw/utils.py:94-116 default config)."""

    def __init__(self, n_labels=N_LABELS, n_chars=N_CHARS):
        super().__init__()
        self.bert = transformers.BertModel(
            transformers.BertConfig(**TINY_BERT))
        h = TINY_BERT["hidden_size"]
        self.classifier = torch.nn.Linear(h, n_labels)
        self.descriptor_bias = torch.nn.Parameter(torch.randn(n_labels))
        self.char_descriptor = torch.nn.Embedding(n_chars, n_labels)

    def forward(self, input_ids, token_type_ids, attention_mask,
                phoneme_mask, char_ids, position_ids):
        out = self.bert(input_ids=input_ids, attention_mask=attention_mask,
                        token_type_ids=token_type_ids).last_hidden_state
        q = out[torch.arange(out.shape[0]), position_ids]
        logits = (self.classifier(q) + self.descriptor_bias
                  + self.char_descriptor(char_ids))
        logits = logits.masked_fill(phoneme_mask == 0, float("-inf"))
        return torch.softmax(logits, dim=-1)


def _batch(rng, b=3, t=10):
    ids = rng.integers(5, 60, (b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    mask[0, -3:] = 0
    pm = np.zeros((b, N_LABELS), np.float32)
    for i in range(b):
        pm[i, rng.choice(N_LABELS, 3, replace=False)] = 1
    return dict(
        input_ids=ids, token_type_ids=np.zeros_like(ids),
        attention_mask=mask, phoneme_mask=pm,
        char_ids=rng.integers(0, N_CHARS, (b,)).astype(np.int32),
        position_ids=rng.integers(1, t - 3, (b,)).astype(np.int32))


def test_g2pw_model_parity(rng):
    torch.manual_seed(0)
    tnet = TorchG2PW().eval()
    batch = _batch(rng)
    with torch.no_grad():
        ref = tnet(**{k: torch.from_numpy(np.asarray(v)).long()
                      if v.dtype == np.int32 else torch.from_numpy(v)
                      for k, v in batch.items()}).numpy()

    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    cfg = jg.G2PWConfig(n_labels=N_LABELS, n_chars=N_CHARS,
                        use_conditional=True, conditional_bias=True,
                        char_linear=True)
    bert_cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position=64)
    model = jg.make_g2pw_model(bert_cfg, cfg)
    params = {"params": jg.convert_g2pw_weights(state, cfg)}
    ours = np.asarray(model.apply(params, **batch))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)
    # probabilities respect the phoneme mask
    assert (ours[batch["phoneme_mask"] == 0] == 0).all()


@pytest.fixture
def model_dir(tmp_path):
    """A complete tiny G2PWModel directory (weights + dicts + tokenizer)."""
    torch.manual_seed(1)
    # 6 distinct phoneme labels below; 3 polyphonic chars
    tnet = TorchG2PW(n_labels=6, n_chars=3)
    # polyphonic chars use labels that map through the bopomofo dict
    (tmp_path / "POLYPHONIC_CHARS.txt").write_text(
        "行\tㄒㄧㄥˊ2\n行\tㄏㄤˊ2\n了\tㄌㄜ˙5\n了\tㄌㄧㄠˇ3\n好\tㄏㄠˇ3\n好\tㄏㄠˋ4\n",
        encoding="utf8")
    (tmp_path / "MONOPHONIC_CHARS.txt").write_text(
        "你\tㄋㄧˇ3\n世\tㄕˋ4\n", encoding="utf8")
    bopomofo = {"ㄒㄧㄥˊ": "xing", "ㄏㄤˊ": "hang", "ㄌㄜ˙": "le",
                "ㄌㄧㄠˇ": "liao", "ㄏㄠˇ": "hao", "ㄏㄠˋ": "hao",
                "ㄋㄧˇ": "ni", "ㄕˋ": "shi"}
    (tmp_path / "bopomofo_to_pinyin_wo_tune_dict.json").write_text(
        json.dumps(bopomofo, ensure_ascii=False), encoding="utf8")
    (tmp_path / "char_bopomofo_dict.json").write_text("{}", encoding="utf8")

    torch.save(tnet.state_dict(), tmp_path / "g2pW.pth")

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + list(
        "你好世界银行了我们去过的中国天气很") + ["ni", "hao"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab), encoding="utf8")
    tok = transformers.BertTokenizer(str(tmp_path / "vocab.txt"))
    tok.save_pretrained(str(tmp_path))
    return str(tmp_path)


def test_g2pw_predictor_pipeline(model_dir):
    pred = jg.G2PWPredictor(model_dir)
    assert pred.available
    fallback_calls = []

    def fallback(ch):
        fallback_calls.append(ch)
        return {"你": "ni3", "世": "shi4"}.get(ch, ch)

    seg = "你好世界银行"
    readings = pred.lazy_pinyin(seg, fallback)
    assert len(readings) == len(seg)
    # monophonic chars come from the dict, not the fallback
    assert readings[0] == "ni3"          # 你: MONOPHONIC ㄋㄧˇ3 -> ni3
    assert readings[2] == "shi4"         # 世: MONOPHONIC ㄕˋ4 -> shi4
    # polyphonic chars are model-predicted within their allowed label set
    assert readings[1] in {"hao3", "hao4"}
    assert readings[5] in {"xing2", "hang2"}
    # non-dict chars fall back
    assert "界" in fallback_calls and "银" in fallback_calls


def test_g2pw_wordize_tokenize_maps():
    class FakeTok:
        def tokenize(self, w):
            return list(w) if not w.isascii() else [w.lower()]

    tokens, text2token, token2text = jg.tokenize_and_map(FakeTok(), "中 ab文")
    assert tokens == ["中", "ab", "文"]
    assert text2token == [0, None, 1, 1, 2]
    assert token2text == [(0, 1), (2, 4), (4, 5)]
