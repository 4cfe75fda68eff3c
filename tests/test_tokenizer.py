"""Tokenizer tests: tiny synthetic vocab + (when present) the real world vocab."""

import os

import pytest

from chirrup_tpu.utils.tokenizer import WorldTokenizer, StreamingDecoder

REAL_VOCAB = "/root/reference/Albatross/rwkv_vocab_v20230424.txt"


@pytest.fixture()
def tiny_vocab(tmp_path):
    # ids sparse on purpose; mix of str and bytes literals
    lines = [
        "1 'a' 1",
        "2 'b' 1",
        "3 'ab' 2",
        "4 'abc' 3",
        "5 ' ' 1",
        "6 'hello' 5",
        "7 b'\\xe4\\xb8' 2",
        "8 b'\\xad' 1",
        "9 '中' 3",
        "10 'c' 1",
    ]
    # every byte must be reachable: add all single bytes not covered
    covered = {b"a"[0], b"b"[0], b"c"[0], b" "[0], 0xE4, 0xB8, 0xAD}
    next_id = 11
    for byte in range(256):
        if byte not in covered and next_id < 300:
            lines.append(f"{next_id} {bytes([byte])!r} 1")
            next_id += 1
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(lines), encoding="utf-8")
    return str(p)


def test_greedy_longest_match(tiny_vocab):
    tok = WorldTokenizer(tiny_vocab)
    assert tok.encode("ab") == [3]
    assert tok.encode("abc") == [4]
    assert tok.encode("abb") == [3, 2]
    assert tok.encode("hello ab") == [6, 5, 3]
    assert tok.decode(tok.encode("hello abc b")) == "hello abc b"


def test_multibyte_roundtrip(tiny_vocab):
    tok = WorldTokenizer(tiny_vocab)
    ids = tok.encode("a中b")
    assert tok.decode(ids) == "a中b"
    # '中' should win as a single token over its byte pieces
    assert 9 in ids


def test_streaming_decoder_partial_utf8(tiny_vocab):
    tok = WorldTokenizer(tiny_vocab)
    dec = StreamingDecoder(tok)
    # token 7 is the first two bytes of '中', token 8 the last byte
    assert dec.push(7) == ""      # incomplete: buffered, nothing emitted
    assert dec.push(8) == "中"    # completed
    assert dec.flush() == ""


@pytest.mark.skipif(not os.path.exists(REAL_VOCAB), reason="real vocab not available")
def test_real_vocab_roundtrip():
    tok = WorldTokenizer(REAL_VOCAB)
    # file covers ids 1..65529; the model's vocab/head dim is padded to 65536
    assert tok.vocab_size == 65530
    text = ("Hello world! The quick brown fox jumps over the lazy dog. "
            "数字化转型正在改变世界。🦜 Émile café naïve\n\ttabs and  spaces")
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    assert all(0 < i < 65536 for i in ids)


@pytest.mark.skipif(not os.path.exists(REAL_VOCAB), reason="real vocab not available")
def test_real_vocab_known_specials():
    tok = WorldTokenizer(REAL_VOCAB)
    # DEFAULT_STOP_TOKENS = [0, 261, 24281] (reference core_structure.py:15):
    # 261 = '\n\n' and 24281 = '\n\nUser' in the world vocab
    assert tok.idx2token[261] == b"\n\n"
    assert tok.idx2token[0] == b"<|endoftext|>"
