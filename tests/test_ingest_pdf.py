"""PDF ingestion: pure-Python parser on synthetic + real PDFs, node emission."""

import os
import zlib

import pytest

from mmrag_tpu.ingest.pdf import MiniPdf, PdfExtractionError, extract_pdf_nodes
from mmrag_tpu.settings import load_settings

REFERENCE_PDF = "/root/reference/temp_Integrated1.pdf"


def _make_pdf(tmp_path, page_texts, name="doc.pdf"):
    """Build a tiny valid-enough PDF with Flate-compressed content streams."""

    objects = []
    kids = []
    next_id = 3
    content_ids = []
    for text in page_texts:
        stream = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
        comp = zlib.compress(stream)
        content_ids.append(next_id + 1)
        kids.append(next_id)
        objects.append(
            (next_id,
             f"<< /Type /Page /Parent 2 0 R /Contents {next_id + 1} 0 R >>".encode())
        )
        objects.append(
            (next_id + 1,
             b"<< /Filter /FlateDecode /Length " + str(len(comp)).encode()
             + b" >>\nstream\n" + comp + b"\nendstream")
        )
        next_id += 2
    kid_refs = " ".join(f"{k} 0 R" for k in kids)
    header = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kid_refs}] /Count {len(kids)} >>".encode()),
    ]
    body = b"%PDF-1.4\n"
    for num, payload in header + objects:
        body += f"{num} 0 obj\n".encode() + payload + b"\nendobj\n"
    body += b"%%EOF"
    path = tmp_path / name
    path.write_bytes(body)
    return str(path)


def test_minipdf_page_texts(tmp_path):
    path = _make_pdf(tmp_path, ["Hello page one", "Second page here"])
    pdf = MiniPdf(open(path, "rb").read())
    texts = pdf.page_texts()
    assert texts == ["Hello page one", "Second page here"]


def test_minipdf_escapes(tmp_path):
    path = _make_pdf(tmp_path, [r"Parens \( inside \) and \\ backslash"])
    pdf = MiniPdf(open(path, "rb").read())
    assert pdf.page_texts()[0] == "Parens ( inside ) and \\ backslash"


def test_extract_pdf_nodes(tmp_path):
    cfg = load_settings({"MEDIA_DIR": str(tmp_path / "media")})
    path = _make_pdf(tmp_path, ["alpha " * 100, "beta " * 100])
    text_nodes, image_nodes = extract_pdf_nodes("u1", "doc1", path, cfg)
    assert text_nodes and image_nodes == []
    pages = {n["metadata"]["page"] for n in text_nodes}
    assert pages == {1, 2}
    assert all(n["id"].startswith("doc1-p") for n in text_nodes)


def test_extract_missing_file(tmp_path):
    cfg = load_settings({"MEDIA_DIR": str(tmp_path / "media")})
    with pytest.raises(PdfExtractionError):
        extract_pdf_nodes("u1", "d", str(tmp_path / "nope.pdf"), cfg)


def test_extract_non_pdf(tmp_path):
    cfg = load_settings({"MEDIA_DIR": str(tmp_path / "media")})
    bad = tmp_path / "fake.pdf"
    bad.write_bytes(b"not a pdf at all")
    with pytest.raises(PdfExtractionError):
        extract_pdf_nodes("u1", "d", str(bad), cfg)


@pytest.mark.skipif(not os.path.exists(REFERENCE_PDF), reason="sample PDF absent")
def test_real_world_pdf(tmp_path):
    cfg = load_settings({"MEDIA_DIR": str(tmp_path / "media")})
    text_nodes, image_nodes = extract_pdf_nodes("u1", "ref", REFERENCE_PDF, cfg)
    assert len(text_nodes) >= 6  # 6 pages of dense text
    joined = " ".join(n["text"] for n in text_nodes)
    assert "computer vision" in joined  # word spacing was reconstructed
    assert len(image_nodes) >= 3  # embedded figures extracted
    for node in image_nodes:
        assert os.path.getsize(node["image_path"]) > 0
