"""Minimal deterministic OOXML generators for tests and the
extraction round-trip oracle (the office analog of
``sources/pdf_gen.simple_text_pdf``): just enough structure for the
docx/xlsx/pptx extractors to parse, with fixed zip timestamps so the
bytes are reproducible.
"""

from __future__ import annotations

import zipfile
from io import BytesIO
from xml.sax.saxutils import escape

_EPOCH = (1980, 1, 1, 0, 0, 0)

_W_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    "{overrides}"
    "</Types>"
)
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">{rels}</Relationships>'
)


def _zip(parts: dict[str, str]) -> bytes:
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in parts.items():
            zi = zipfile.ZipInfo(name, date_time=_EPOCH)
            zf.writestr(zi, content)
    return buf.getvalue()


def simple_docx(paragraphs: list[str]) -> bytes:
    """One plain paragraph per list entry (Normal style)."""
    body = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{escape(t)}</w:t></w:r></w:p>'
        for t in paragraphs
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f"<w:document {_W_NS}><w:body>{body}</w:body></w:document>"
    )
    return _zip({
        "[Content_Types].xml": _CT.format(overrides=(
            '<Override PartName="/word/document.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'wordprocessingml.document.main+xml"/>'
        )),
        "_rels/.rels": _RELS.format(rels=(
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/officeDocument" '
            'Target="word/document.xml"/>'
        )),
        "word/document.xml": doc,
    })


def docx_with_image(
    media: bytes | None,
    paragraphs: tuple[str, ...] = ("before", "after"),
    target: str = "media/image1.png",
) -> bytes:
    """A docx whose first paragraph carries a DrawingML blip referencing
    ``rId9`` → ``word/<target>``; ``media=None`` omits the media part
    (unresolvable relationship). Used to pin the genos image-validity
    gate (picture placeholders only for PIL-openable blobs)."""
    ns_extra = (
        'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships"'
    )
    pic = (
        "<w:p><w:r><w:drawing>"
        '<a:blip r:embed="rId9"/>'
        "</w:drawing></w:r></w:p>"
    )
    body = pic + "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{escape(t)}</w:t></w:r></w:p>'
        for t in paragraphs
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f"<w:document {_W_NS} {ns_extra}><w:body>{body}</w:body>"
        "</w:document>"
    )
    parts = {
        "[Content_Types].xml": _CT.format(overrides=(
            '<Override PartName="/word/document.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'wordprocessingml.document.main+xml"/>'
        )),
        "_rels/.rels": _RELS.format(rels=(
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/officeDocument" '
            'Target="word/document.xml"/>'
        )),
        "word/document.xml": doc,
        "word/_rels/document.xml.rels": _RELS.format(rels=(
            '<Relationship Id="rId9" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/image" '
            f'Target="{target}"/>'
        )),
    }
    if media is not None:
        parts[f"word/{target}"] = media
    return _zip(parts)


def simple_xlsx(rows: list[list[str]]) -> bytes:
    """One sheet, inline-string cells, rows starting at A1."""
    def col_letter(c: int) -> str:
        out = ""
        c += 1
        while c:
            c, rem = divmod(c - 1, 26)
            out = chr(65 + rem) + out
        return out

    row_xml = []
    for ri, row in enumerate(rows):
        cells = "".join(
            f'<c r="{col_letter(ci)}{ri + 1}" t="inlineStr">'
            f'<is><t xml:space="preserve">{escape(v)}</t></is></c>'
            for ci, v in enumerate(row)
        )
        row_xml.append(f'<row r="{ri + 1}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(row_xml) + "</sheetData></worksheet>"
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    return _zip({
        "[Content_Types].xml": _CT.format(overrides=(
            '<Override PartName="/xl/workbook.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
        )),
        "_rels/.rels": _RELS.format(rels=(
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/>'
        )),
        "xl/workbook.xml": wb,
        "xl/_rels/workbook.xml.rels": _RELS.format(rels=(
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/worksheet" '
            'Target="worksheets/sheet1.xml"/>'
        )),
        "xl/worksheets/sheet1.xml": sheet,
    })


def simple_pptx(texts: list[str]) -> bytes:
    """One slide with one plain text shape per entry."""
    shapes = "".join(
        "<p:sp><p:nvSpPr><p:cNvPr id=\"%d\" name=\"t%d\"/><p:cNvSpPr/>"
        "<p:nvPr/></p:nvSpPr><p:spPr/><p:txBody><a:bodyPr/>"
        '<a:p><a:r><a:t>%s</a:t></a:r></a:p>'
        "</p:txBody></p:sp>" % (i + 2, i, escape(t))
        for i, t in enumerate(texts)
    )
    slide = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:sld xmlns:p="http://schemas.openxmlformats.org/'
        'presentationml/2006/main" xmlns:a="http://schemas.'
        'openxmlformats.org/drawingml/2006/main">'
        "<p:cSld><p:spTree>"
        '<p:nvGrpSpPr><p:cNvPr id="1" name=""/><p:cNvGrpSpPr/><p:nvPr/>'
        "</p:nvGrpSpPr><p:grpSpPr/>"
        + shapes + "</p:spTree></p:cSld></p:sld>"
    )
    pres = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:presentation xmlns:p="http://schemas.openxmlformats.org/'
        'presentationml/2006/main" xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships">'
        '<p:sldIdLst><p:sldId id="256" r:id="rId1"/></p:sldIdLst>'
        "</p:presentation>"
    )
    return _zip({
        "[Content_Types].xml": _CT.format(overrides=(
            '<Override PartName="/ppt/presentation.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'presentationml.presentation.main+xml"/>'
            '<Override PartName="/ppt/slides/slide1.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'presentationml.slide+xml"/>'
        )),
        "_rels/.rels": _RELS.format(rels=(
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/officeDocument" '
            'Target="ppt/presentation.xml"/>'
        )),
        "ppt/presentation.xml": pres,
        "ppt/_rels/presentation.xml.rels": _RELS.format(rels=(
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/slide" '
            'Target="slides/slide1.xml"/>'
        )),
        "ppt/slides/slide1.xml": slide,
    })


def simple_hwpx(paragraphs: list[str]) -> bytes:
    """Minimal HWPX (Hancom OWPML) zip: one Contents/section0.xml with
    one hp:p/hp:run/hp:t per paragraph. Text must be XML-escaped by us;
    the walker reads hp:t text verbatim."""
    from xml.sax.saxutils import escape

    body = "".join(
        f"<hp:p><hp:run><hp:t>{escape(p)}</hp:t></hp:run></hp:p>"
        for p in paragraphs
    )
    section = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<hs:sec xmlns:hs="http://www.hancom.co.kr/hwpml/2011/section" '
        'xmlns:hp="http://www.hancom.co.kr/hwpml/2011/paragraph">'
        f"{body}</hs:sec>"
    )
    return _zip({
        "mimetype": "application/hwp+zip",
        "version.xml": '<?xml version="1.0" encoding="UTF-8"?><version/>',
        "Contents/section0.xml": section,
    })
