"""Streaming parser + prompt formatter tests (reference semantics,
streaming_string_parser.py / prompt_formatters.py)."""

from chirrup_tpu.utils.streaming_parser import (
    StreamingStringParser, TRIE_THINK_NO_TRIGGER, TRIE_THINK_KEEP_TRIGGER)
from chirrup_tpu.utils.prompt_formatters import (
    clean_openai_messages, format_no_thinking, format_with_thinking,
    format_quick_thinking)


def _feed(parser, chunks):
    out = []
    for ch in chunks:
        out.extend(parser.parse(ch))
    return out


def test_think_routing_whole():
    p = StreamingStringParser(tries=TRIE_THINK_NO_TRIGGER)
    out = p.parse("<think>reasoning here</think>answer")
    assert out == [("reasoning here", "reasoning_content"), ("answer", "content")]


def test_think_routing_split_across_chunks():
    p = StreamingStringParser(tries=TRIE_THINK_NO_TRIGGER)
    out = _feed(p, ["<thi", "nk>abc", "</th", "ink>xyz"])
    joined = {}
    for text, state in out:
        joined[state] = joined.get(state, "") + text
    assert joined == {"reasoning_content": "abc", "content": "xyz"}


def test_partial_match_flush():
    p = StreamingStringParser(tries=TRIE_THINK_NO_TRIGGER)
    out = p.parse("<thinking is fun")
    # "<think" buffered, then 'i' fails the trigger -> flushed as content
    assert "".join(t for t, s in out if s == "content") == "<thinking is fun"


def test_double_newline_ends():
    p = StreamingStringParser(tries=TRIE_THINK_NO_TRIGGER)
    out = p.parse("hello\n\nmore")
    assert ("hello", "content") == out[0]
    assert ("\n\nmore", "end") in out or [s for _, s in out][-1] == "end"


def test_keep_trigger_variants():
    p = StreamingStringParser(tries=TRIE_THINK_KEEP_TRIGGER)
    out = p.parse("<think>r</think>c")
    # "<think>" keeps the NEW state, "</think>" the OLD state -> all three pieces
    # share "reasoning_content" and merge into one run
    assert out == [("<think>r</think>", "reasoning_content"), ("c", "content")]


def test_initial_state_seeding():
    """The server seeds the parser with the prompt's assistant cue
    (app.py:250-251) so '<think>' already opened switches state."""
    p = StreamingStringParser(tries=TRIE_THINK_NO_TRIGGER)
    p.parse("Assistant:<think>")
    assert p.current_state == "reasoning_content"
    out = p.parse("thought</think>final")
    joined = {}
    for text, state in out:
        joined[state] = joined.get(state, "") + text
    assert joined == {"reasoning_content": "thought", "content": "final"}


# ------------------------------------------------------------------ formatters

def test_clean_messages():
    msgs = [
        {"role": "system", "content": "be\n\n\nnice"},
        {"role": "user", "content": " hi "},
        {"role": "assistant", "content": "yo"},
    ]
    assert clean_openai_messages(msgs) == "System: be\nnice\n\nUser: hi\n\nAssistant: yo"


def test_formatter_cues():
    msgs = [{"role": "user", "content": "q"}]
    assert format_no_thinking(msgs).endswith("\n\nAssistant:")
    assert format_with_thinking(msgs).endswith("\n\nAssistant:<think>")
    assert format_quick_thinking(msgs).endswith("\n\nAssistant:<think>\n</think>")
