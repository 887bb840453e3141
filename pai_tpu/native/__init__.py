"""Native (C++) host-side runtime: PNG codec, antialiased resize, threaded
batch decode. Built on demand with g++ (make -C pai_tpu/native); every entry
point has a pure-Python/PIL fallback in the callers, so a missing toolchain
degrades gracefully."""
