"""SQLite-FTS5 differential oracle (FIXTURES.md §2, SURVEY.md §5b).

Rebuilds the reference tool's storage layer exactly — same schema, same
triggers, same ``search_bm25`` SQL, same query pre-tokenization — so that
rank identity against the *real* FTS5 ``bm25()`` implementation (the
physical engine the reference delegates to) can be asserted, not just
against our own reimplementation of the formula.

Schema/trigger DDL mirrors reference ``storage/sqlite_storage.py:181-225``;
search SQL mirrors ``storage/sqlite_storage.py:663-671``; query tokenizer
mirrors ``storage/sqlite_storage.py:31-56``.
"""

from __future__ import annotations

import hashlib
import re
import sqlite3


class FTS5Oracle:
    def __init__(self) -> None:
        self.conn = sqlite3.connect(":memory:")
        c = self.conn
        c.executescript(
            """
            CREATE TABLE documents (
                id INTEGER PRIMARY KEY,
                path TEXT NOT NULL UNIQUE,
                filename TEXT NOT NULL,
                md5_hash TEXT NOT NULL,
                content TEXT,
                mime_type TEXT NOT NULL,
                file_size INTEGER NOT NULL,
                indexed_at TEXT NOT NULL,
                updated_at TEXT NOT NULL
            );
            CREATE VIRTUAL TABLE documents_fts USING fts5(
                path, filename, content,
                content='documents', content_rowid='id'
            );
            CREATE TRIGGER documents_ai AFTER INSERT ON documents BEGIN
                INSERT INTO documents_fts(rowid, path, filename, content)
                VALUES (new.id, new.path, new.filename, new.content);
            END;
            CREATE TRIGGER documents_ad AFTER DELETE ON documents BEGIN
                INSERT INTO documents_fts(documents_fts, rowid, path, filename, content)
                VALUES ('delete', old.id, old.path, old.filename, old.content);
            END;
            CREATE TRIGGER documents_au AFTER UPDATE ON documents BEGIN
                INSERT INTO documents_fts(documents_fts, rowid, path, filename, content)
                VALUES ('delete', old.id, old.path, old.filename, old.content);
                INSERT INTO documents_fts(rowid, path, filename, content)
                VALUES (new.id, new.path, new.filename, new.content);
            END;
            """
        )

    def add_documents(self, rows: list[tuple[str, str, str, str, str]]) -> None:
        """rows = (repo, path, commit, lang, content) in doc_id order —
        rowid follows insertion order, matching our assign_doc_ids."""
        for repo, path, _commit, _lang, content in rows:
            full_path = f"{repo}/{path}"
            filename = path.rsplit("/", 1)[-1]
            self.conn.execute(
                "INSERT INTO documents (path, filename, md5_hash, content,"
                " mime_type, file_size, indexed_at, updated_at)"
                " VALUES (?, ?, ?, ?, ?, ?, ?, ?)",
                (
                    full_path,
                    filename,
                    hashlib.md5(content.encode()).hexdigest(),
                    content,
                    "text/plain",
                    len(content),
                    "2026-01-01T00:00:00",
                    "2026-01-01T00:00:00",
                ),
            )
        self.conn.commit()

    @staticmethod
    def tokenize_query(query: str) -> str:
        tokens = [t for t in re.split(r"[^a-zA-Z0-9]+", query.lower()) if t]
        if not tokens:
            raise ValueError(f"Query produced no searchable tokens: {query!r}")
        return " ".join(tokens)

    def search_bm25(self, query: str, top_k: int = 10) -> list[tuple]:
        """Verbatim reference search path. Returns
        [(doc_id, path, filename, content, score)] — score negated back to
        positive, exactly like reference ``sqlite_storage.py:665``."""
        fts_query = self.tokenize_query(query)
        cur = self.conn.execute(
            """
            SELECT d.id, d.path, d.filename, d.content,
                   -bm25(documents_fts) AS score
            FROM documents_fts f
            JOIN documents d ON f.rowid = d.id
            WHERE documents_fts MATCH ?
            ORDER BY bm25(documents_fts)
            LIMIT ?
            """,
            (fts_query, top_k),
        )
        return cur.fetchall()

    def sha256_by_id(self) -> dict[int, str]:
        return {
            i: hashlib.sha256(c.encode()).hexdigest()
            for i, c in self.conn.execute("SELECT id, content FROM documents")
        }
