"""CLI tools with avconv/avprobe semantics (reference: avtools/)."""
