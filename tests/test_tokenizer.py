"""Tokenizer parity tests vs llama_tokenize behavior (utils.cpp:275-311)
— SURVEY.md §4 test layer 3, including the quirks."""

from llama_swift_tpu.tokenizer import BOS_TOKEN_ID, Vocab


def _brute_force_tokenize(pieces, text, bos):
    """Direct transcription of the reference loop for cross-checking:
    scan ALL ids ascending; longest match wins, ties -> later id."""
    data = text.encode("utf-8") if isinstance(text, str) else text
    res = [BOS_TOKEN_ID] if bos else []
    pos = 0
    while True:
        l, t = 0, 0
        for i, piece in enumerate(pieces):
            if len(piece) < l or len(piece) == 0:
                continue
            if len(piece) > len(data) - pos:
                continue
            if data[pos : pos + len(piece)] == piece:
                l, t = len(piece), i
        if l == 0:
            break
        res.append(t)
        pos += l
    return res


def test_greedy_longest_match():
    v = Vocab([b"<unk>", b"<s>", b"a", b"b", b"ab", b"abc", b"c"])
    assert v.tokenize("abc") == [5]
    assert v.tokenize("abab") == [4, 4]
    assert v.tokenize("abca") == [5, 2]


def test_bos_prepended():
    v = Vocab([b"<unk>", b"<s>", b"a"])
    assert v.tokenize("a", bos=True) == [BOS_TOKEN_ID, 2]
    assert v.tokenize("a", bos=False) == [2]


def test_tie_broken_by_max_id():
    # duplicate piece string: highest id wins (std::map iteration order +
    # equal-length overwrite)
    v = Vocab([b"x", b"dup", b"y", b"dup"])
    assert v.tokenize(b"dup") == [3]


def test_stops_at_unmatched_byte():
    # reference silently discards everything from the first unmatched pos
    v = Vocab([b"<unk>", b"<s>", b"a", b"b"])
    assert v.tokenize("ab\xffab") == [2, 3]  # stops at the 0xc3 byte of 'ÿ'


def test_empty_pieces_never_match():
    v = Vocab([b"", b"", b"a"])
    assert v.tokenize("a") == [2]
    assert v.tokenize("z") == []


def test_matches_brute_force(tiny_vocab_pieces):
    v = Vocab(tiny_vocab_pieces)
    for text in [
        "the rain in spain",
        "hello world",
        " a the on winger",
        "THE QUICK brown fox!",
        "",
    ]:
        for bos in (False, True):
            assert v.tokenize(text, bos) == _brute_force_tokenize(
                tiny_vocab_pieces, text, bos
            ), text


def test_detokenize_roundtrip(tiny_vocab_pieces):
    v = Vocab(tiny_vocab_pieces)
    text = "the rain in spain stays mainly on the plain"
    ids = v.tokenize(text)
    assert v.detokenize(ids) == text


def test_bytes_pieces_invalid_utf8():
    # byte-fallback tokens may be invalid utf-8 on their own
    v = Vocab([b"<unk>", b"<s>", bytes([0xC3]), bytes([0xA9])])
    ids = v.tokenize("é")  # 0xC3 0xA9
    assert ids == [2, 3]
    assert v.detokenize(ids) == "é"  # reassembles across byte tokens
    assert v.piece_str(2) == "�"  # lone continuation byte -> replacement
