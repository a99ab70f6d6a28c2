"""Sources: file formats -> the mandated corpus schema."""

from .jsonfiles import corpus_from_json_files, corpus_from_jsonl

__all__ = ["corpus_from_json_files", "corpus_from_jsonl"]
