"""Minimal HTML DOM on the stdlib ``html.parser`` — no bs4/lxml in this
environment, and the parse UDFs need only a small selector surface.

Design constraint (parity with the reference parsers): chat/mail content
is the *inner HTML* of a node, byte-faithful to the source (entities
like ``&scy;`` stay escaped, attribute order/quoting untouched). The
parser therefore runs with ``convert_charrefs=False`` and every node
records the raw source fragments of its children, reassembled verbatim
by :func:`inner_html`.

Supported query surface (all the reference's BeautifulSoup usage):
tag + class descendant search, id search, attribute-equality search,
first-match, next-sibling element, document-order ``find_next``,
``text`` / ``stripped_strings``.
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser

VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


def _html5_entity_map() -> dict[str, str]:
    """char → '&name;' for non-ASCII chars with an HTML5 named entity
    (the reference's html5 output formatter re-encodes these; ASCII
    text is left raw). First name in sorted order wins, matching the
    reference serializer's choice."""
    out: dict[str, str] = {}
    from html.entities import html5 as _h5

    for name, char in sorted(_h5.items()):
        if not name.endswith(";") or len(char) != 1 or ord(char) < 128:
            continue
        out.setdefault(char, f"&{name}")
    return out


_ENTITY_SUB = _html5_entity_map()


def _sub_entities(text: str) -> str:
    if text.isascii():
        return text
    return "".join(_ENTITY_SUB.get(ch, ch) for ch in text)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "raw_parts")

    def __init__(self, tag: str, attrs: dict[str, str | None], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []  # str children are raw source text
        self.parent = parent
        self.raw_parts: list[str] = []  # raw source of this whole element

    # -- class / attr helpers ------------------------------------------------

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def __getitem__(self, name: str):
        return self.attrs[name]

    # -- text ----------------------------------------------------------------

    def _texts(self, out: list[str]) -> None:
        for c in self.children:
            if isinstance(c, str):
                out.append(_html.unescape(c))
            else:
                c._texts(out)

    @property
    def text(self) -> str:
        out: list[str] = []
        self._texts(out)
        return "".join(out)

    @property
    def stripped_strings(self) -> list[str]:
        out: list[str] = []

        def walk(n: Node) -> None:
            for c in n.children:
                if isinstance(c, str):
                    s = _html.unescape(c).strip()
                    if s:
                        out.append(s)
                else:
                    walk(c)

        walk(self)
        return out

    # -- traversal -----------------------------------------------------------

    def descendants(self):
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.descendants()

    def element_children(self) -> list["Node"]:
        return [c for c in self.children if isinstance(c, Node)]

    def matches(self, tag: str | None, classes: set[str], attr_eq: dict[str, str]) -> bool:
        if tag and self.tag != tag:
            return False
        if classes and not classes.issubset(set(self.classes)):
            return False
        for k, v in attr_eq.items():
            if self.attrs.get(k) != v:
                return False
        return True

    def __repr__(self) -> str:  # debug aid
        return f"<{self.tag} {self.attrs}>"


def _parse_selector(sel: str) -> tuple[str | None, set[str], dict[str, str]]:
    """'div.chip-media', 'i.f7-icons', "img[src='/x.png']", '#inbox'."""
    attr_eq: dict[str, str] = {}
    if "[" in sel:
        sel, _, rest = sel.partition("[")
        k, _, v = rest.rstrip("]").partition("=")
        attr_eq[k] = v.strip("'\"")
    if sel.startswith("#"):
        attr_eq["id"] = sel[1:]
        return None, set(), attr_eq
    parts = sel.split(".")
    tag = parts[0] or None
    return tag, set(p for p in parts[1:] if p), attr_eq


def select(root: Node, selector: str) -> list[Node]:
    """Descendant search; space-separated compound selectors supported
    (e.g. ``div.chip-media img``)."""
    steps = selector.split()
    current = [root]
    for step in steps:
        tag, classes, attr_eq = _parse_selector(step)
        nxt: list[Node] = []
        seen: set[int] = set()
        for base in current:
            for n in base.descendants():
                if id(n) not in seen and n.matches(tag, classes, attr_eq):
                    nxt.append(n)
                    seen.add(id(n))
        current = nxt
    return current


def select_one(root: Node, selector: str) -> Node | None:
    found = select(root, selector)
    return found[0] if found else None


def find_next_sibling(node: Node, tag: str) -> Node | None:
    if node.parent is None:
        return None
    sibs = node.parent.element_children()
    idx = next((i for i, s in enumerate(sibs) if s is node), None)
    if idx is None:
        return None
    for s in sibs[idx + 1 :]:
        if s.tag == tag:
            return s
    return None


def find_next(node: Node, tag: str) -> Node | None:
    """First element with ``tag`` after ``node`` in document order
    (BeautifulSoup ``find_next`` semantics: descendants first, then
    following siblings, then ancestors' following siblings)."""
    for d in node.descendants():
        if d.tag == tag:
            return d
    cur: Node | None = node
    while cur is not None and cur.parent is not None:
        sibs = cur.parent.element_children()
        idx = next((i for i, s in enumerate(sibs) if s is cur), None)
        if idx is not None:
            for s in sibs[idx + 1 :]:
                if s.tag == tag:
                    return s
                for d in s.descendants():
                    if d.tag == tag:
                        return d
        cur = cur.parent
    return None


def inner_html(node: Node) -> str:
    """Byte-faithful inner HTML (the reference's ``decode_contents``)."""
    parts: list[str] = []
    for c in node.children:
        if isinstance(c, str):
            parts.append(c)
        else:
            parts.append("".join(c.raw_parts))
    return "".join(parts)


def _fmt_attr(v: str) -> str:
    return (
        v.replace("&", "&amp;").replace('"', "&quot;")
        .replace("<", "&lt;").replace(">", "&gt;")
    )


def _fmt_starttag(tag: str, attrs) -> str:
    """Serialize a start tag the way the reference's html5 formatter
    does: double-quoted attributes sorted by name, void elements
    without a trailing slash."""
    parts = [tag]
    for k, v in sorted(attrs):
        parts.append(k if v is None else f'{k}="{_fmt_attr(v)}"')
    return "<" + " ".join(parts) + ">"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.root = Node("[document]", {}, None)
        self.stack: list[Node] = [self.root]

    # raw-source bookkeeping: append the exact source text of every event
    # to every open element so inner_html is byte-faithful
    def _raw(self, s: str) -> None:
        for n in self.stack:
            if n is not self.root:
                n.raw_parts.append(s)

    def _text_child(self, s: str) -> None:
        self.stack[-1].children.append(s)

    def handle_starttag(self, tag, attrs):
        raw = _fmt_starttag(tag, attrs)
        self._raw(raw)
        node = Node(tag, dict(attrs), self.stack[-1])
        node.raw_parts.append(raw)
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        raw = _fmt_starttag(tag, attrs)
        if tag not in VOID_TAGS:
            raw += f"</{tag}>"
        self._raw(raw)
        node = Node(tag, dict(attrs), self.stack[-1])
        node.raw_parts.append(raw)
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        raw = f"</{tag}>"
        # lenient close: pop to the nearest matching open tag
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                self._raw(raw)
                del self.stack[i:]
                return
        # stray end tag: record as raw text only
        self._raw(raw)

    def handle_data(self, data):
        data = _sub_entities(data)
        self._raw(data)
        self._text_child(data)

    def handle_entityref(self, name):
        s = f"&{name};"
        self._raw(s)
        self._text_child(s)

    def handle_charref(self, name):
        s = f"&#{name};"
        self._raw(s)
        self._text_child(s)

    def handle_comment(self, data):
        self._raw(f"<!--{data}-->")


def parse_html(content: bytes | str) -> Node:
    if isinstance(content, bytes):
        content = content.decode("utf-8", errors="replace")
    tb = _TreeBuilder()
    tb.feed(content)
    tb.close()
    return tb.root
