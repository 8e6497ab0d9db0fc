"""Generic AMOS message-format reader.

Covers the inspection role of the bundled ``message-extract`` /
``bank-report`` utilities (SURVEY.md section 2.3): parses the nested
``{TAG\nkey:value\n...}`` message blocks emitted by the AMOS toolchain
(e.g. OVL/RED/CTG streams) into plain dicts.

Multi-line values (``seq:\n...\n.``) and nested messages are supported.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field


@dataclass
class AmosMessage:
    type: str
    fields: dict[str, str] = field(default_factory=dict)
    children: list["AmosMessage"] = field(default_factory=list)

    def get_int(self, key: str, default: int = 0) -> int:
        try:
            return int(self.fields.get(key, default))
        except ValueError:
            return default


def iter_amos_messages(path_or_text: str, *, is_text: bool = False) -> Iterator[AmosMessage]:
    text = path_or_text if is_text else open(path_or_text).read()
    lines = text.splitlines()
    stack: list[AmosMessage] = []
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith("{"):
            stack.append(AmosMessage(type=line[1:].strip()))
        elif line.startswith("}"):
            if stack:
                msg = stack.pop()
                if stack:
                    stack[-1].children.append(msg)
                else:
                    yield msg
        elif ":" in line and stack:
            key, val = line.split(":", 1)
            if val == "":  # multi-line value terminated by '.'
                parts: list[str] = []
                i += 1
                while i < len(lines) and lines[i] != ".":
                    parts.append(lines[i])
                    i += 1
                stack[-1].fields[key] = "".join(parts)
            else:
                stack[-1].fields[key] = val
        i += 1


def read_amos_messages(path: str, type_filter: str | None = None) -> list[AmosMessage]:
    out = []
    for m in iter_amos_messages(path):
        if type_filter is None or m.type == type_filter:
            out.append(m)
    return out
