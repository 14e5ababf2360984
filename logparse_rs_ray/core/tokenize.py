"""Quote-aware CSV tokenization with the reference engine's exact semantics.

Reproduces the behavior of the reference tokenizer
(/root/reference/crates/logparse_core/src/tokenizer.rs:4-127) bit-for-bit:

* a field starting with ``"`` consumes until an unescaped closing quote;
  ``""`` inside quotes is a literal ``"``; any bytes between the closing
  quote and the next ``,`` are silently discarded (tokenizer.rs:101-103);
* inside quotes each *byte* is pushed as a char (Latin-1-style widening), so
  multi-byte UTF-8 inside a quoted field is mangled (tokenizer.rs:97), while
  unquoted fields round-trip UTF-8 intact (tokenizer.rs:104-119);
* a trailing comma yields a trailing empty field (tokenizer.rs:76-79);
* an empty input line yields zero fields (tokenizer.rs:142-143);
* ``extract_field(line, len(fields))`` is ``""`` when the line does not end
  with ``,`` and ``None`` when it does; larger indexes are ``None``
  (tokenizer.rs:10-16, 165-175).

These are per-line kernels; the batch layer (`stages/parse.py`) applies a
vectorized pyarrow fast path for quote-free lines and falls back to these
functions only for the (rare) quoted lines, so the hot path stays columnar.
"""

from __future__ import annotations

__all__ = ["split_csv", "extract_field", "split_csv_bytes", "extract_field_bytes"]


def split_csv_bytes(data: bytes) -> list[str]:
    """Split one CSV line (raw bytes) into fields, reference semantics."""
    n = len(data)
    out: list[str] = []
    i = 0
    while i <= n:
        if i >= n:
            if n > 0 and data[n - 1] == 0x2C:  # trailing ','
                out.append("")
            break
        if data[i] == 0x22:  # '"' -> quoted field, bytes widen to chars
            i += 1
            chars: list[str] = []
            while i < n:
                b = data[i]
                if b == 0x22:
                    if i + 1 < n and data[i + 1] == 0x22:
                        chars.append('"')
                        i += 2
                    else:
                        i += 1
                        break
                else:
                    chars.append(chr(b))
                    i += 1
            field = "".join(chars)
            # discard junk between closing quote and next comma
            while i < n and data[i] != 0x2C:
                i += 1
        else:
            end = data.find(b",", i)
            if end == -1:
                end = n
            seg = data[i:end]
            try:
                field = seg.decode("utf-8")
            except UnicodeDecodeError:
                field = seg.decode("latin-1")
            i = end
        if i < n and data[i] == 0x2C:
            i += 1
        out.append(field)
    return out


def split_csv(line: str) -> list[str]:
    """Split one CSV line (str) into fields, reference semantics."""
    return split_csv_bytes(line.encode("utf-8"))


def extract_field_bytes(data: bytes, target_idx: int) -> str | None:
    """Extract one field by index without a full split (reference semantics)."""
    n = len(data)
    i = 0
    idx = 0
    while idx <= target_idx and i <= n:
        if i >= n:
            return "" if idx == target_idx else None
        if data[i] == 0x22:
            i += 1
            chars: list[str] = []
            while i < n:
                b = data[i]
                if b == 0x22:
                    if i + 1 < n and data[i + 1] == 0x22:
                        chars.append('"')
                        i += 2
                        continue
                    i += 1
                    break
                chars.append(chr(b))
                i += 1
            field = "".join(chars)
            while i < n and data[i] != 0x2C:
                i += 1
        else:
            end = data.find(b",", i)
            if end == -1:
                end = n
            seg = data[i:end]
            try:
                field = seg.decode("utf-8")
            except UnicodeDecodeError:
                field = seg.decode("latin-1")
            i = end
        if i < n and data[i] == 0x2C:
            i += 1
        if idx == target_idx:
            return field
        idx += 1
    return None


def extract_field(line: str, target_idx: int) -> str | None:
    return extract_field_bytes(line.encode("utf-8"), target_idx)
