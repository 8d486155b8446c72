"""Native host runtime (C++ via ctypes) for byte-level hot paths."""
