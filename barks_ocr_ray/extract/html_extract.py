"""HTML main-content extraction: stdlib html.parser DOM walk emitting text
blocks with char-span offsets, classified by text/link density.

Engine stage 4 for the HTML path (SURVEY.md §7.1): the warm-parser kernel
— the analog of the reference's segmentation + recognize + group arc
(OCR boxes -> AI groups -> panel assignment,
/root/reference/src/barks_ocr/pipeline/gemini_grouper.py:172-248). Blocks
here play the role of speech groups; the boilerplate/content/title/nav
typing mirrors the bubble-type enum
(/root/reference/src/barks_ocr/utils/gemini_ai_comic_prompts.py:68);
link/text-density classification is the boilerpipe-style stand-in for the
bubble/caption geometric heuristics.

Determinism contract (the hard part, SURVEY.md §7.3): extraction is a pure
function of the decoded document — no dict-order, float-order or
parallelism dependence — so the distributed pipeline matches these goldens
byte-identically at any batch/block partitioning.

Span contract (FIXTURES.md F2): each emitted block carries the raw
(start, end) char offsets of its contributing text nodes into the decoded
document; ``decoded[start:end]`` reassembles each block's raw text.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# Tags that open/close a text block (block-level boundary set).
BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li ul ol title section article header footer
    nav table thead tbody tr td th blockquote pre body html head br hr
    form fieldset figure figcaption main aside""".split()
)
SKIP_TAGS = frozenset({"script", "style", "noscript", "svg", "template"})
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "title"})

TYPE_CONTENT = "content"
TYPE_BOILERPLATE = "boilerplate"
TYPE_TITLE = "title"
TYPE_NAV = "nav"

# Classification thresholds (boilerpipe-style block classifier).
MAX_LINK_DENSITY = 0.33  # above -> boilerplate
NAV_LINK_DENSITY = 0.66  # above -> nav
MIN_CONTENT_CHARS = 25
MIN_CONTENT_WORDS = 5

_WS_RE = re.compile(r"\s+")
_DASH_RE = re.compile("[‐-―−]+")


def clean_text(s: str) -> str:
    """Normalize/clean (engine stage 5): soft-hyphen strip, dash-variant
    folding, whitespace collapse — the analog of the reference's scoring
    canonicalizers (M12 /root/reference/src/barks_ocr/tools/florence_check.py:306-316
    and the soft-hyphen/newline canonicalization at
    /root/reference/src/barks_ocr/pipeline/whoosh_index.py:92-95).

    ``" ".join(s.split())`` is exactly whitespace-run collapse + strip
    (C-level; the regex equivalent dominated the kernel profile). The
    soft-hyphen/dash folding only applies to non-ASCII text — the targets
    are all non-ASCII code points, so ``isascii`` (one C scan) gates the
    two extra passes."""
    if not s.isascii():
        s = s.replace("­", "")
        s = _DASH_RE.sub("-", s)
    return " ".join(s.split())


@dataclass
class Block:
    block_id: int
    type: str
    text: str  # cleaned text
    link_density: float
    text_density: float
    spans: list[tuple[int, int]] = field(default_factory=list)


@dataclass
class _Segment:
    text: str
    start: int
    end: int
    in_link: bool


#: one token per markup construct; text runs are the gaps between tokens.
#: (A direct scanner, not html.parser: the stdlib parser's per-tag Python
#: machinery dominated the kernel profile at ~3x the cost. Character
#: references are treated as literal text — span fidelity over entity
#: decoding, which also makes decoded[start:end] == the block's raw text
#: hold for entity-bearing documents.)
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"  # comments (unterminated -> rest of doc)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"  # CDATA
    r"|<![^>]*>"  # doctype / declarations
    r"|<\?[^>]*>"  # processing instructions
    r"|</?([a-zA-Z][a-zA-Z0-9:_-]*)"  # tag name (group 1)
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"  # attrs (group 2, quote-aware)
    r"(/?)>",  # self-closing marker (group 3)
    re.S,
)


class _BlockWalker:
    """Single-pass scanner: block boundaries at BLOCK_TAGS, script/style
    skipped, per-text-node char spans taken directly from token offsets."""

    def __init__(self, doc: str):
        self._doc = doc
        self._segments: list[_Segment] = []
        self._tag_count = 0
        self._a_depth = 0
        self._skip_depth = 0
        self._heading = False
        self.blocks: list[Block] = []

    def feed(self, doc: str) -> None:
        pos = 0
        for m in _TOKEN_RE.finditer(doc):
            if m.start() > pos:
                self.handle_data(doc[pos : m.start()], pos)
            pos = m.end()
            name = m.group(1)
            if name is None:
                continue  # comment / doctype / declaration
            name = name.lower()
            token = m.group(0)
            if token.startswith("</"):
                self.handle_endtag(name)
            elif m.group(3) == "/":
                self.handle_startendtag(name, ())
            else:
                self.handle_starttag(name, ())
        if pos < len(doc):
            self.handle_data(doc[pos:], pos)

    def _flush(self) -> None:
        segs, self._segments = self._segments, []
        tag_count, self._tag_count = self._tag_count, 0
        heading, self._heading = self._heading, False
        if not segs:
            return
        raw = "".join(s.text for s in segs)
        text = clean_text(raw)
        if not text:
            return
        if len(segs) == 1:
            seg_lens = [len(text)]
        else:
            seg_lens = [len(clean_text(s.text)) for s in segs]
        total = sum(seg_lens)
        link = sum(n for s, n in zip(segs, seg_lens) if s.in_link)
        link_density = link / total if total else 0.0
        text_density = len(text) / (1.0 + tag_count)
        if heading:
            btype = TYPE_TITLE
        elif link_density >= NAV_LINK_DENSITY:
            btype = TYPE_NAV
        elif link_density >= MAX_LINK_DENSITY:
            btype = TYPE_BOILERPLATE
        elif len(text) < MIN_CONTENT_CHARS or len(text.split()) < MIN_CONTENT_WORDS:
            btype = TYPE_BOILERPLATE
        else:
            btype = TYPE_CONTENT
        self.blocks.append(
            Block(
                block_id=len(self.blocks),
                type=btype,
                text=text,
                link_density=round(link_density, 6),
                text_density=round(text_density, 6),
                spans=[(s.start, s.end) for s in segs],
            )
        )

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag in HEADING_TAGS:
                self._heading = True
        elif tag == "a":
            self._a_depth += 1
            self._tag_count += 1
        else:
            self._tag_count += 1

    def handle_startendtag(self, tag, attrs):
        if tag in SKIP_TAGS or self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        else:
            self._tag_count += 1

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)

    def handle_data(self, data, start):
        if self._skip_depth or not data:
            return
        self._segments.append(
            _Segment(data, start, start + len(data), self._a_depth > 0)
        )

    def close(self):
        self._flush()


def extract_html(doc: str) -> list[Block]:
    """Walk a decoded HTML document into classified text blocks."""
    w = _BlockWalker(doc)
    w.feed(doc)
    w.close()
    return w.blocks


def assemble_text(blocks: list[Block]) -> str:
    """The byte-identical extraction contract: content blocks only,
    joined by newline (titles/nav/boilerplate stripped)."""
    return "\n".join(b.text for b in blocks if b.type == TYPE_CONTENT)
