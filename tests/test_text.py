import numpy as np

from gst_tacotron_tpu.text import (
    EOS_ID,
    NUM_SYMBOLS,
    PAD_ID,
    batch_text_to_ids,
    ids_to_text,
    text_to_ids,
)
from gst_tacotron_tpu.text.cleaners import english_cleaners
from gst_tacotron_tpu.text.numbers import normalize_numbers


def test_number_expansion():
    assert normalize_numbers("2 cats") == "two cats"
    assert normalize_numbers("21 dogs") == "twenty one dogs"
    assert normalize_numbers("in 1984 he left") == "in nineteen eighty four he left"
    assert normalize_numbers("chapter 3rd") == "chapter third"
    assert normalize_numbers("$1.50 please") == "one dollar, fifty cents please"
    # keithito-lineage semantics: 1000<n<3000 reads year-style even for
    # comma-grouped quantities (kept for tokenizer parity with the reference)
    assert normalize_numbers("1,234 items") == "twelve thirty four items"
    assert normalize_numbers("5,678 items") == (
        "five thousand six hundred seventy eight items"
    )
    assert normalize_numbers("3.14 pie") == "three point one four pie"


def test_english_cleaners():
    assert english_cleaners("Dr. Smith  lives at   No 21.") == (
        "doctor smith lives at no twenty one."
    )
    assert english_cleaners("Héllo WORLD!") == "hello world!"


def test_tokenize_roundtrip():
    ids = text_to_ids("Hello, world.")
    assert ids[-1] == EOS_ID
    assert all(0 <= i < NUM_SYMBOLS for i in ids)
    assert ids_to_text(ids) == "hello, world."


def test_batch_padding():
    ids, lengths = batch_text_to_ids(["hi", "longer sentence"])
    assert ids.shape[0] == 2
    assert ids.dtype == np.int32
    assert lengths[0] < lengths[1]
    assert ids[0, lengths[0]:].tolist() == [PAD_ID] * (ids.shape[1] - lengths[0])
    # deterministic: same text -> same ids
    ids2, _ = batch_text_to_ids(["hi", "longer sentence"])
    np.testing.assert_array_equal(ids, ids2)
