"""Output validation against extraction schemas (SURVEY.md A9).

Semantics of ``validate_extracted_output``
(/root/reference/crates/ares-core/src/schema.rs:37-68): validate the
extracted JSON value against the user schema, return a flat error list
capped at 10; invalid rows are NEVER persisted (scrape.rs:576-594).

A minimal draft-07 subset validator (type / properties / required /
items / enum) is implemented here so nothing beyond the stdlib ships to
executors; it covers every construct the packaged schemas use. If the
``jsonschema`` package is importable it is preferred.
"""

from __future__ import annotations

MAX_ERRORS = 10  # schema.rs:58 caps the reported list

try:  # optional accelerator; not present in the sandbox image
    import jsonschema as _jsonschema  # type: ignore
except ImportError:
    _jsonschema = None

_TYPE_CHECKS = {
    "object": lambda v: isinstance(v, dict),
    "array": lambda v: isinstance(v, list),
    "string": lambda v: isinstance(v, str),
    "integer": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "number": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "boolean": lambda v: isinstance(v, bool),
    "null": lambda v: v is None,
}


def _validate(value, schema: dict, path: str, errors: list[str]) -> None:
    if len(errors) >= MAX_ERRORS:
        return
    loc = path or "<root>"
    typ = schema.get("type")
    if typ is not None:
        types = typ if isinstance(typ, list) else [typ]
        if not any(_TYPE_CHECKS.get(t, lambda v: True)(value) for t in types):
            errors.append(f"{loc}: expected type {typ}, got {type(value).__name__}")
            return
    if "enum" in schema and value not in schema["enum"]:
        errors.append(f"{loc}: value not in enum")
    if isinstance(value, dict):
        for req in schema.get("required", []):
            if req not in value:
                errors.append(f"{loc}: missing required property '{req}'")
                if len(errors) >= MAX_ERRORS:
                    return
        props = schema.get("properties", {})
        for k, sub in props.items():
            if k in value:
                _validate(value[k], sub, f"{path}.{k}" if path else k, errors)
    elif isinstance(value, list):
        items = schema.get("items")
        if isinstance(items, dict):
            for i, item in enumerate(value):
                _validate(item, items, f"{path}[{i}]", errors)
                if len(errors) >= MAX_ERRORS:
                    return


def validate_extracted_output(schema: dict, value) -> list[str]:
    """Return validation errors (empty = valid), capped at MAX_ERRORS."""
    if _jsonschema is not None:
        validator = _jsonschema.Draft7Validator(schema)
        return [
            f"{'/'.join(str(p) for p in e.absolute_path) or '<root>'}: {e.message}"
            for e in list(validator.iter_errors(value))[:MAX_ERRORS]
        ]
    errors: list[str] = []
    _validate(value, schema, "", errors)
    return errors[:MAX_ERRORS]


def validate_schema(schema) -> list[str]:
    """Meta-validate a schema document (schema.rs:10-22): must be an object
    with a type, and properties/required well-formed."""
    errors = []
    if not isinstance(schema, dict):
        return ["schema must be a JSON object"]
    if schema.get("type") not in (None, *(t for t in _TYPE_CHECKS)):
        errors.append(f"unknown type '{schema.get('type')}'")
    props = schema.get("properties")
    if props is not None and not isinstance(props, dict):
        errors.append("'properties' must be an object")
    req = schema.get("required")
    if req is not None and (
        not isinstance(req, list) or not all(isinstance(r, str) for r in req)
    ):
        errors.append("'required' must be an array of strings")
    return errors
