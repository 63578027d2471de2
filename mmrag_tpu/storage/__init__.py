"""Storage: SQLite catalogs for documents/chunks and notes."""
from .records import Chunk, Document, RetrievedHit, VectorRow, new_id
from .metadata import MetadataStore
from .notes import NoteStore

__all__ = ["Chunk", "Document", "RetrievedHit", "VectorRow", "new_id", "MetadataStore", "NoteStore"]
