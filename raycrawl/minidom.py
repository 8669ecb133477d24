"""A minimal deterministic HTML DOM for the extraction chain.

bs4/lxml/trafilatura are not available in this environment (SURVEY.md §7.1),
so the reference's BeautifulSoup-based extraction (crawler.py:520-628) is
re-expressed over this self-contained stdlib ``html.parser`` DOM. The subset
implemented is exactly what the extraction chain needs, with semantics matched
to BeautifulSoup where they overlap:

- ``get_text(separator, strip)``: document-order concatenation of descendant
  text nodes; with ``strip=True`` each string is stripped and empties dropped
  (bs4 ``PageElement.get_text`` behavior).
- ``select`` / ``select_one``: simple-selector subset — ``tag``, ``.class``,
  ``#id``, ``[attr="val"]``, ``[attr*="val"]``, ``tag[attr="val"]`` and
  comma-separated unions — enough for the reference's candidate and
  boilerplate selector lists (crawler.py:536-557).
- ``find_all`` / ``find`` by tag name, document order.
- ``decompose``: detach a subtree.

The fixture generator emits only well-formed HTML from this same closed
world, so parser behavior on pathological markup is out of scope by design
(documented in SURVEY.md §7.7).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict[str, str] | None = None, parent: "Node | None" = None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list[object] = []  # Node | str
        self.parent = parent

    # -- attribute access -------------------------------------------------
    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    # -- traversal --------------------------------------------------------
    def iter_descendants(self):
        """All element descendants, document order (excluding self)."""
        stack = [c for c in reversed(self.children) if isinstance(c, Node)]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(c for c in reversed(node.children) if isinstance(c, Node))

    def iter_strings(self):
        """All text strings under self, document order."""
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                yield c
            else:
                stack.extend(reversed(c.children))

    def find_all(self, name: str | bool = True) -> list["Node"]:
        if name is True:
            return list(self.iter_descendants())
        return [n for n in self.iter_descendants() if n.name == name]

    def find(self, name: str) -> "Node | None":
        for n in self.iter_descendants():
            if n.name == name:
                return n
        return None

    # -- text -------------------------------------------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        if strip:
            parts = [s2 for s in self.iter_strings() if (s2 := s.strip())]
        else:
            parts = list(self.iter_strings())
        return separator.join(parts)

    def text_len_stripped(self) -> int:
        """len(get_text(strip=True)) without building the joined string."""
        return sum(len(s.strip()) for s in self.iter_strings())

    # -- selectors ---------------------------------------------------------
    def _matches(self, sel: "_SimpleSelector") -> bool:
        if sel.tag and self.name != sel.tag:
            return False
        if sel.cls and sel.cls not in self.classes():
            return False
        if sel.id_ and self.attrs.get("id") != sel.id_:
            return False
        if sel.attr:
            key, op, val = sel.attr
            got = self.attrs.get(key)
            if got is None:
                return False
            if op == "=" and got != val:
                return False
            if op == "*=" and val not in got:
                return False
        return True

    def select(self, selector: str) -> list["Node"]:
        sels = _parse_selector_list(selector)
        out = []
        for n in self.iter_descendants():
            if any(n._matches(s) for s in sels):
                out.append(n)
        return out

    def select_one(self, selector: str) -> "Node | None":
        sels = _parse_selector_list(selector)
        for n in self.iter_descendants():
            if any(n._matches(s) for s in sels):
                return n
        return None

    # -- mutation ----------------------------------------------------------
    def decompose(self) -> None:
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<{self.name} {self.attrs}>"


class _SimpleSelector:
    __slots__ = ("tag", "cls", "id_", "attr")

    def __init__(self, tag=None, cls=None, id_=None, attr=None):
        self.tag = tag
        self.cls = cls
        self.id_ = id_
        self.attr = attr  # (key, op, value)


def _parse_simple(sel: str) -> _SimpleSelector:
    sel = sel.strip()
    tag = cls = id_ = attr = None
    # split off [attr...] part
    if "[" in sel:
        base, _, rest = sel.partition("[")
        rest = rest.rstrip("]")
        if "*=" in rest:
            k, _, v = rest.partition("*=")
            attr = (k.strip(), "*=", v.strip().strip("\"'"))
        elif "=" in rest:
            k, _, v = rest.partition("=")
            attr = (k.strip(), "=", v.strip().strip("\"'"))
        else:
            attr = (rest.strip(), "*=", "")
        sel = base.strip()
    if sel.startswith("."):
        cls = sel[1:]
    elif sel.startswith("#"):
        id_ = sel[1:]
    elif sel:
        tag = sel
    return _SimpleSelector(tag=tag, cls=cls, id_=id_, attr=attr)


def _parse_selector_list(selector: str) -> list[_SimpleSelector]:
    return [_parse_simple(s) for s in selector.split(",") if s.strip()]


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        # html.parser lowercases tag names already; attrs values may be None
        node.attrs = {k: (v if v is not None else "") for k, v in node.attrs.items()}
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        # close the nearest matching open element (tolerates mild misnesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
