"""Lexer-grade code normalization (type-1 canonical text), string-literal safe.

The round-3 normalizer (`operators.codedup.normalize_code_col`) strips
comments with bare regexes, which corrupts real code two ways:

- a string literal containing a comment marker is truncated
  (``url = "http://x"`` loses ``//x"``), so type-1 hashes diverge between
  files that are byte-identical after layout changes;
- Python floor division (``a // b``) is eaten as a line comment.

This module scans instead of pattern-matching: a single compiled
alternation per language family in which STRING LITERALS match before
comment markers — first-match-wins makes the regex engine a proper
string/comment state machine while staying linear-time and C-speed (no
per-character Python loop). Semantics:

- string literals are preserved VERBATIM (including internal whitespace —
  two files differing only inside a literal are not type-1 clones);
- comments are replaced by a single space;
- all other whitespace runs collapse to one space.

Language families (corpus langs map onto them; unknown langs get the
C-family, the least destructive default because ``#`` is left alone):

- ``python``: ``#`` line comments; ``'''``/``\"\"\"`` triple-quoted and
  ``'``/``"`` single-quoted strings with backslash escapes. ``//`` and
  ``/* */`` are CODE (floor division / operators).
- ``c`` (java, javascript, go, c, c++, rust, ...): ``//`` and ``/* */``
  comments; ``"``/``'`` escaped strings and `` ` `` raw strings (Go raw
  literal / JS template literal — no escapes, ``${}`` nesting ignored).
- ``hash`` (shell, ruby, perl, yaml, ...): ``#`` line comments;
  ``"``/``'`` escaped strings.

Known limits (documented, not silent): an unterminated string literal falls
through as plain code, and JS regex literals are not recognized (a comment
marker inside ``/re//`` is treated as a comment) — both are lexically
ambiguous without a full parser and rare enough that the tiered matcher's
other tiers absorb them.

Pure functions — shared verbatim by the Spark Arrow feature UDF
(operators.codedup.code_features), the oracle fixture builder
(codefixtures.py) and tests, so fixture parity holds by construction.

reference: biblib src/dedupe.rs normalization discipline (comment/layout
invariance before hashing); the string-literal safety requirement is the
round-3 verdict's "What's wrong #3".
"""

from __future__ import annotations

import re

# string alternatives first: first-match-wins is the state machine. The
# junk group matches a RUN of comments/whitespace (one-or-more alternation)
# so adjacent comment+newline collapses to one space — idempotency, and
# byte-parity with the regex twin's trailing \s+ collapse.
_PY = re.compile(
    r"(?P<s>'''(?:\\.|[^\\])*?'''"
    r'|"""(?:\\.|[^\\])*?"""'
    r"|'(?:\\.|[^'\\\n])*'"
    r'|"(?:\\.|[^"\\\n])*")'
    r"|(?P<j>(?:#[^\n]*|\s+)+)",
    re.DOTALL,  # lets the escape alternative \\. cross a backslash-newline
)
_C = re.compile(
    r"(?P<s>`[^`]*`"
    r"|'(?:\\.|[^'\\\n])*'"
    r'|"(?:\\.|[^"\\\n])*")'
    r"|(?P<j>(?:/\*.*?\*/|//[^\n]*|\s+)+)",
    re.DOTALL,
)
_HASH = re.compile(
    r"(?P<s>'(?:\\.|[^'\\\n])*'"
    r'|"(?:\\.|[^"\\\n])*")'
    r"|(?P<j>(?:#[^\n]*|\s+)+)"
)

_FAMILY = {
    "python": _PY,
    "py": _PY,
    "java": _C,
    "javascript": _C,
    "js": _C,
    "typescript": _C,
    "go": _C,
    "c": _C,
    "cpp": _C,
    "c++": _C,
    "rust": _C,
    "scala": _C,
    "kotlin": _C,
    "shell": _HASH,
    "sh": _HASH,
    "bash": _HASH,
    "ruby": _HASH,
    "rb": _HASH,
    "perl": _HASH,
    "yaml": _HASH,
}


def _repl(m: re.Match) -> str:
    s = m.group("s")
    if s is not None:
        return s  # string literal: verbatim
    return " "  # comment or whitespace run


def normalize_code_lexed(content: str, lang: str) -> str:
    """String-literal-safe type-1 normalization of ``content`` for ``lang``.

    Comments -> single space, whitespace runs outside strings -> single
    space, string literals verbatim; leading/trailing space trimmed.
    """
    pat = _FAMILY.get(lang, _C)
    return pat.sub(_repl, content).strip()
