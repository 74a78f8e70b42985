"""RSS/Atom feed extraction: syndication XML -> reading-order blocks.

Real crawls are full of feed documents (application/rss+xml, atom+xml);
the reference pipeline would hand them to the VLM like any text page
(core/parser.py:308-322). Routing them through the HTML segmenter as-is
produces noise — element soup of dates/guids/urls interleaved with
escaped markup. This module parses the three syndication shapes that
cover the format in practice (RSS 2.0, RSS 1.0 / RDF, Atom) and emits the
same Block stream the DOM segmenter produces, so classification, markdown
emission, span addressing, and byte-identity goldens all apply unchanged:

    channel/feed title      -> heading level 1
    channel description     -> paragraph
    per item/entry: title   -> heading level 2
    item content            -> the entry's HTML, run through dom.segment()

Item content selects the fullest field available (content:encoded over
description for RSS, content over summary for Atom) and handles all three
encodings feeds use: CDATA-wrapped raw HTML, entity-escaped HTML, and
inline XHTML child markup. Non-content metadata (links, dates, guids,
authors, categories, enclosures) is dropped — it is the feed analogue of
boilerplate. Item fields are flushed title-first at element close, so
field order inside the XML never changes the output (reading-order
normalization, same rule family as the PDF y-cluster sort).

The scanner is the same deliberate XML subset as kernel/svg_info.py:
prolog constructs skipped, quoted attributes, CDATA, entity decode via
the shared WHATWG table; malformed markup degrades to skip-ahead.
"""
from __future__ import annotations

import re

from docvision_spark.kernel.dom import Block, segment
from docvision_spark.kernel.entities import decode_entities

_NAME_RE = re.compile(r"[A-Za-z_:][-A-Za-z0-9._:]*")

# local names whose text is an item's content, in preference order
_RSS_CONTENT = ("encoded", "description")   # content:encoded, description
_ATOM_CONTENT = ("content", "summary")
_ITEM_TAGS = {"item", "entry"}
_ROOTS = {"rss", "feed", "rdf"}


def _local(tag: str) -> str:
    return tag.rsplit(":", 1)[-1].lower()


def looks_like_feed(s: str) -> bool:
    """True when the document's root element is a syndication root
    (<rss>, <feed>, or RSS 1.0's <rdf:RDF>). Scans only the prolog."""
    pos, n = 0, min(len(s), 4096)
    while pos < n:
        lt = s.find("<", pos)
        if lt < 0 or lt >= n:
            return False
        if s[pos:lt].strip():
            return False  # character data before the root: not XML
        if s.startswith("<!--", lt):
            end = s.find("-->", lt + 4)
            pos = n if end < 0 else end + 3
            continue
        if s.startswith("<?", lt) or s.startswith("<!", lt):
            end = s.find(">", lt + 2)
            pos = n if end < 0 else end + 1
            continue
        m = _NAME_RE.match(s, lt + 1)
        return bool(m) and _local(m.group(0)) in _ROOTS
    return False


def _fragment_blocks(raw: str, cdata: list[str], saw_child: bool) -> list[Block]:
    """Blocks for one content field. CDATA bodies are raw HTML; inline
    child markup (Atom type=xhtml) is raw HTML; otherwise the text is
    entity-escaped HTML or plain text."""
    if cdata:
        html = "".join(cdata)
    elif saw_child:
        html = raw
    else:
        html = decode_entities(raw)
    if "<" in html:
        return segment(html)
    text = " ".join(html.split())
    if not text:
        return []
    return [Block(kind="paragraph", text=text, chars=len(text),
                  words=len(text.split()), signal=1)]


def feed_blocks(s: str) -> list[Block]:
    """Parse feed markup -> Block list (see module docstring)."""
    n = len(s)
    pos = 0
    blocks: list[Block] = []
    stack: list[str] = []

    # per-item capture state
    item_title: str | None = None
    item_fields: dict[str, tuple[str, list[str], bool]] = {}
    chan_title_done = False

    # active capture: (local, depth, start_offset, cdata_bodies, saw_child)
    cap: list | None = None

    def heading(text: str, level: int) -> None:
        t = " ".join(decode_entities(text).split())
        if t:
            blocks.append(Block(kind="heading", text=t, level=level,
                                chars=len(t), words=len(t.split()), signal=1))

    def flush_item() -> None:
        nonlocal item_title
        if item_title is not None:
            heading(item_title, 2)
        in_atom = "feed" in (_local(t) for t in stack)
        for name in (_ATOM_CONTENT if in_atom else _RSS_CONTENT):
            if name in item_fields:
                blocks.extend(_fragment_blocks(*item_fields[name]))
                break
        item_title = None
        item_fields.clear()

    def in_item() -> bool:
        return any(_local(t) in _ITEM_TAGS for t in stack)

    while pos < n:
        lt = s.find("<", pos)
        if lt < 0:
            lt = n
        if lt > pos and cap is not None:
            pass  # raw capture slices the source directly at close
        pos = lt
        if pos >= n:
            break
        if s.startswith("<!--", pos):
            end = s.find("-->", pos + 4)
            pos = n if end < 0 else end + 3
            continue
        if s.startswith("<![CDATA[", pos):
            end = s.find("]]>", pos + 9)
            body = s[pos + 9:n if end < 0 else end]
            if cap is not None:
                cap[3].append(body)
            pos = n if end < 0 else end + 3
            continue
        if s.startswith("<?", pos) or s.startswith("<!", pos):
            end = s.find(">", pos + 2)
            pos = n if end < 0 else end + 1
            continue
        gt = s.find(">", pos)
        if gt < 0:
            break
        raw = s[pos + 1:gt]
        tag_start = pos
        pos = gt + 1
        if raw.startswith("/"):  # end tag
            name = _local(raw[1:].strip())
            if cap is not None:
                # cap[1] is the stack depth BEFORE the captured element was
                # pushed; its own close tag arrives at depth cap[1] + 1
                if name == cap[0] and len(stack) == cap[1] + 1:
                    # capture complete: slice inner markup verbatim
                    inner = s[cap[2]:tag_start]
                    field = cap[0]
                    saw_child = cap[4]
                    if in_item():
                        item_fields.setdefault(
                            field, (inner, cap[3], saw_child))
                    cap = None
                else:
                    cap[4] = True  # child end tag inside the capture
            for i in range(len(stack) - 1, -1, -1):
                if _local(stack[i]) == name:
                    if cap is not None and i <= cap[1]:
                        # error recovery: the pop removes the CAPTURED
                        # element itself (unclosed void child pushed a
                        # phantom depth, so the exact-depth check above
                        # missed) — complete the capture here rather
                        # than leak it into the next item
                        if in_item():
                            item_fields.setdefault(
                                cap[0], (s[cap[2]:tag_start], cap[3],
                                         cap[4]))
                        cap = None
                    closing_item = any(_local(t) in _ITEM_TAGS
                                       for t in stack[i:])
                    del stack[i:]
                    if closing_item:
                        flush_item()
                    break
            continue
        m = _NAME_RE.match(raw)
        if not m:
            continue
        tag = m.group(0)
        local = _local(tag)
        selfclose = raw.rstrip().endswith("/")
        if cap is not None:
            cap[4] = True  # child start tag inside the capture
            if not selfclose:
                stack.append(tag)
            continue
        if local == "title" and not selfclose:
            # capture title text inline (plain, short); a self-closed
            # <title/> (legal empty title) must NOT scan forward — the
            # next sibling's markup is not a title
            end = s.find("</", pos)
            body_end = end if end >= 0 else n
            body = s[pos:body_end]
            if body.startswith("<![CDATA["):
                ce = body.find("]]>")
                body = body[9:ce if ce >= 0 else len(body)]
            if in_item():
                if item_title is None:
                    item_title = body
            elif stack and _local(stack[-1]) in ("channel", "feed") \
                    and not chan_title_done:
                heading(body, 1)
                chan_title_done = True
            pos = body_end
            continue
        if in_item() and local in ("encoded", "description", "content",
                                   "summary") and not selfclose:
            cap = [local, len(stack), pos, [], False]
            stack.append(tag)
            continue
        if not in_item() and local == "description" and stack \
                and _local(stack[-1]) == "channel" and not selfclose:
            end = s.find("</", pos)
            body_end = end if end >= 0 else n
            body = s[pos:body_end]
            if body.startswith("<![CDATA["):
                ce = body.find("]]>")
                body = body[9:ce if ce >= 0 else len(body)]
            t = " ".join(decode_entities(body).split())
            if t:
                blocks.append(Block(kind="paragraph", text=t, chars=len(t),
                                    words=len(t.split()), signal=1))
            pos = body_end
            continue
        if not selfclose:
            stack.append(tag)
    # truncated feed: complete an open capture with the remaining source,
    # then flush any in-progress item
    if cap is not None and any(_local(t) in _ITEM_TAGS for t in stack):
        item_fields.setdefault(cap[0], (s[cap[2]:], cap[3], cap[4]))
    if any(_local(t) in _ITEM_TAGS for t in stack):
        flush_item()
    return blocks
