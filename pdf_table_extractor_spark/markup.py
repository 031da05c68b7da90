"""The block-markup byte format carried in ``pages.html`` (FIXTURES.md §1).

A minimal stand-in for WARC/HTML + a PDF text layer: one record per line,

    PAGE <page_no> <width> <height>
    W <x0> <x1> <top> <bottom> <text...>
    R <x0> <x1> <top> <bottom>

``W`` is a positioned word (text runs to end of line, may contain spaces);
``R`` is a ruling line segment (for lattice-mode table detection). This is
the "lightweight DOM-block array" the north star names: `parse_markup`
yields the word/ruling boxes `parse_blocks` exposes to the engine.

Rendering and parsing are deliberately trivial and fully deterministic —
all layout intelligence lives downstream (line clustering, column binning).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Word:
    page_no: int
    x0: float
    x1: float
    top: float
    bottom: float
    text: str


@dataclass(frozen=True)
class Ruling:
    page_no: int
    x0: float
    x1: float
    top: float
    bottom: float


def render(
    pages: list[tuple[int, float, float]],
    words: list[Word],
    rulings: list[Ruling] = (),
) -> bytes:
    """Serialize pages (page_no, width, height) + boxes to markup bytes.

    Boxes are grouped under their page header in input order — order inside a
    page is NOT meaningful (the parser re-sorts), mirroring how PDF content
    streams don't guarantee reading order.
    """
    out: list[str] = []
    for page_no, w, h in pages:
        out.append(f"PAGE {page_no} {w:g} {h:g}")
        for word in words:
            if word.page_no == page_no:
                out.append(
                    f"W {word.x0:g} {word.x1:g} {word.top:g} {word.bottom:g} {word.text}"
                )
        for r in rulings:
            if r.page_no == page_no:
                out.append(f"R {r.x0:g} {r.x1:g} {r.top:g} {r.bottom:g}")
    return ("\n".join(out) + "\n").encode("utf-8")


def parse(html: bytes) -> tuple[list[Word], list[Ruling]]:
    """Parse markup bytes back to word/ruling boxes."""
    words: list[Word] = []
    rulings: list[Ruling] = []
    page_no = 0
    for line in html.decode("utf-8").splitlines():
        if not line:
            continue
        kind, rest = line.split(" ", 1)
        if kind == "PAGE":
            page_no = int(rest.split(" ", 1)[0])
        elif kind == "W":
            x0, x1, top, bottom, text = rest.split(" ", 4)
            words.append(Word(page_no, float(x0), float(x1), float(top), float(bottom), text))
        elif kind == "R":
            x0, x1, top, bottom = rest.split(" ")
            rulings.append(Ruling(page_no, float(x0), float(x1), float(top), float(bottom)))
    return words, rulings
