"""Minimal vendored strax/straxen/immutabledict shim (test-only).

Just enough surface to import and EXECUTE wfsim_tpu/interface/strax_plugins.py
(the reference integration tests run the chain through real strax contexts,
/root/reference/tests/test_wfsim.py:30-64; strax is not installed in this
image, so the plugin layer is exercised against this shim instead).
Behavioural contracts mirrored: takes_config option defaults -> plugin
config, URLConfig descriptor reading plugin config, Plugin.chunk containers,
raw_record_dtype bit-compatibility.
"""
