"""Tokenizer wrapper tests (offline).

Parity target: ``HuggingfaceTokenizer`` and its cleaning helpers at
``/root/reference/wan/modules/tokenizers.py``. Real UMT5/T5 vocabularies
cannot be downloaded in this environment, so a tiny WordLevel tokenizer is
built locally with the ``tokenizers`` library and loaded through
``AutoTokenizer`` — exercising the same padding/truncation/mask plumbing.
The cleaning functions are golden-tested against PINNED outputs of the
reference module's pure string functions (``whitespace_clean`` /
``basic_clean`` / ``canonicalize`` at
``/root/reference/wan/modules/tokenizers.py``), captured once — the
reference tree is untrusted content and must not be executed during test
collection (ADVICE r1).
"""

import numpy as np
import pytest

from ltx_video_gpupoor_tpu.utils.tokenizers import (
    HuggingfaceTokenizer,
    basic_clean,
    canonicalize,
    whitespace_clean,
)

# (input, whitespace_clean, basic_clean, canonicalize,
#  canonicalize(keep_punctuation_exact_string="."))
CLEAN_GOLDEN = [
    ("  Hello,   World!  ",
     "Hello, World!", "Hello,   World!", "hello world", "hello world"),
    ("snake_case_words and CAPS",
     "snake_case_words and CAPS", "snake_case_words and CAPS",
     "snake case words and caps", "snake case words and caps"),
    ("a\tb\nc   d", "a b c d", "a\tb\nc   d", "a b c d", "a b c d"),
    ("punct: (keep) [or] {not}; end.",
     "punct: (keep) [or] {not}; end.", "punct: (keep) [or] {not}; end.",
     "punct keep or not end", "punct keep or not end."),
    ("&amp;amp; double-escaped &lt;tag&gt;",
     "&amp;amp; double-escaped &lt;tag&gt;",
     "& double-escaped <tag>",
     "ampamp doubleescaped lttaggt", "ampamp doubleescaped lttaggt"),
]


@pytest.mark.parametrize(
    "text,ws,basic,canon,canon_dot", CLEAN_GOLDEN,
    ids=[c[0][:20] for c in CLEAN_GOLDEN],
)
def test_cleaning_golden(text, ws, basic, canon, canon_dot):
    assert whitespace_clean(text) == ws
    assert basic_clean(text) == basic
    assert canonicalize(text) == canon
    assert canonicalize(text, keep_punctuation_exact_string=".") == canon_dot


@pytest.fixture(scope="module")
def tiny_tokenizer_dir(tmp_path_factory):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    words = (
        "a the quick brown fox jumps over lazy dog hello world and caps "
        "snake case words b c d end punct keep or not".split()
    )
    vocab = {"[PAD]": 0, "[UNK]": 1, "</s>": 2}
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="[PAD]", unk_token="[UNK]",
        eos_token="</s>",
    )
    d = tmp_path_factory.mktemp("tiny_tok")
    fast.save_pretrained(str(d))
    return str(d)


def test_padding_and_mask(tiny_tokenizer_dir):
    t = HuggingfaceTokenizer(tiny_tokenizer_dir, seq_len=8, clean="whitespace")
    ids, mask = t("the quick brown fox", return_mask=True)
    assert ids.shape == (1, 8)
    assert mask.shape == (1, 8)
    # 4 real tokens then padding
    assert mask[0].tolist() == [1, 1, 1, 1, 0, 0, 0, 0]
    assert (ids[0][4:] == 0).all()


def test_truncation(tiny_tokenizer_dir):
    t = HuggingfaceTokenizer(tiny_tokenizer_dir, seq_len=3)
    ids = t("the quick brown fox jumps over the lazy dog")
    assert ids.shape == (1, 3)


def test_batch_and_cleaning_applied(tiny_tokenizer_dir):
    t = HuggingfaceTokenizer(
        tiny_tokenizer_dir, seq_len=6, clean="canonicalize"
    )
    ids, mask = t(["The  QUICK fox!", "snake_case_words"], return_mask=True)
    assert ids.shape == (2, 6)
    # canonicalize lowers + strips punctuation: "the quick fox" -> 3 tokens
    assert mask[0].sum() == 3
    # "snake case words" -> 3 tokens
    assert mask[1].sum() == 3
    ids2 = t("the quick fox")
    np.testing.assert_array_equal(ids[0], ids2[0])


def test_no_seq_len_returns_unpadded(tiny_tokenizer_dir):
    t = HuggingfaceTokenizer(tiny_tokenizer_dir)
    ids = t("hello world")
    assert ids.shape == (1, 2)
