"""Operator CLI tools (console-script entry points).

The calibration tools live here so an installed wheel ships them
(`pcs-register`, `pcs-pick` — see pyproject.toml); the `registration/`
directory at the repo root keeps thin shims for the documented
`python registration/<tool>.py` invocations.
"""
