"""Native (C++) host-side components.

The reference's only native surfaces are third-party libraries (POT's EMD
C extension, onnxruntime, dlib — SURVEY.md §2.4). The device compute path
here is XLA/Pallas; the host-side hot spot that remains is the per-step OT
solve (100+ small exact EMDs, exp-3:1528-1532), provided natively in
emd.cpp and loaded via ctypes with a scipy fallback.

Build: `python -m fairdiff.native.build` (g++ -O2 -shared), or it builds
lazily on first use.
"""

from fairdiff.native.emd_lib import emd_assignment_native, emd_batch_native, native_available

__all__ = ["emd_assignment_native", "emd_batch_native", "native_available"]
