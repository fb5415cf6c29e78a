#!/usr/bin/env python3
"""Differential test of graft.multimodal.Vp8lDecode against libwebp.

The container ships libwebp.so.7 (a dependency of the system image stack)
even though no JVM binding exists — so while the LIBRARY cannot use it,
this dev harness can: encode a spread of images with WebPEncodeLosslessRGBA
(the real encoder picks palettes / predictors / cross-color / subtract-green
/ color cache / LZ77 / meta prefix groups on its own), decode each stream
with BOTH libwebp (WebPDecodeRGBA) and the repo's pure-JVM decoder
(graft.Vp8lDumpMain), and require pixel-exact agreement.

This harness caught the round-9 code-length-order bug the symmetric
round-trip tests could not see (encoder and decoder shared the wrong
constant; real encoder output disagreed).

Usage: python3 dev/vp8l_diff.py [n_random]  (run from the repo root)
"""
import ctypes, os, random, struct, subprocess, sys, tempfile

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.c_void_p)]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def encode(rgba, w, h):
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGBA(bytes(rgba), w, h, w * 4, ctypes.byref(out))
    assert n > 0, "libwebp encode failed"
    data = ctypes.string_at(out.value, n)
    lib.WebPFree(out)
    return data


def decode_ref(data):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp decode failed"
    rgba = ctypes.string_at(p, w.value * h.value * 4)
    lib.WebPFree(p)
    return w.value, h.value, rgba


def images(n_random):
    rnd = random.Random(4242)
    out = []
    # deterministic shapes that push the encoder into different transforms
    for (w, h, kind) in [(1, 1, "flat"), (2, 1, "flat"), (7, 3, "twocolor"),
                         (16, 16, "palette"), (33, 9, "gradient"),
                         (64, 64, "noise"), (57, 13, "stripes"),
                         (200, 120, "mix"), (128, 128, "walk")]:
        out.append((w, h, kind))
    for _ in range(n_random):
        out.append((rnd.randint(1, 90), rnd.randint(1, 90),
                    rnd.choice(["flat", "twocolor", "palette", "gradient",
                                "noise", "stripes", "mix", "walk"])))
    imgs = []
    for i, (w, h, kind) in enumerate(out):
        px = bytearray()
        pal = [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256), 255)
               for _ in range(12)]
        r0 = g0 = b0 = 128
        for y in range(h):
            for x in range(w):
                if kind == "flat":
                    c = pal[0]
                elif kind == "twocolor":
                    c = pal[(x + y) % 2]
                elif kind == "palette":
                    c = pal[(x * 7 + y * 3) % len(pal)]
                elif kind == "gradient":
                    c = (x * 255 // max(w - 1, 1), y * 255 // max(h - 1, 1),
                         (x + y) % 256, 255)
                elif kind == "stripes":
                    c = pal[(x // 4) % 3]
                elif kind == "mix":
                    c = pal[0] if x < w // 2 else (rnd.randrange(256),
                                                   rnd.randrange(256),
                                                   rnd.randrange(256), 255)
                elif kind == "walk":
                    r0 = (r0 + rnd.randint(-6, 6)) % 256
                    g0 = (g0 + rnd.randint(-6, 6)) % 256
                    b0 = (b0 + rnd.randint(-6, 6)) % 256
                    c = (r0, g0, b0, 255)
                else:
                    c = (rnd.randrange(256), rnd.randrange(256),
                         rnd.randrange(256), rnd.randrange(2) * 255)
                px += bytes(c)
        imgs.append((f"img{i:03d}_{kind}_{w}x{h}", w, h, bytes(px)))
    return imgs


def main():
    n_random = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    tmp = tempfile.mkdtemp(prefix="vp8ldiff")
    refs = {}
    for name, w, h, rgba in images(n_random):
        data = encode(rgba, w, h)
        with open(os.path.join(tmp, name + ".webp"), "wb") as f:
            f.write(data)
        refs[name + ".webp"] = decode_ref(data)
    print(f"[vp8l_diff] {len(refs)} streams in {tmp}; running JVM decoder...")
    out = subprocess.run(
        ["sbt", "-batch", f"Test/runMain graft.Vp8lDumpMain {tmp}"],
        capture_output=True, text=True, check=True).stdout
    got = {}
    for line in out.splitlines():
        parts = line.strip().split(" ")
        if parts and parts[0].endswith(".webp"):
            got[parts[0]] = parts[1:]
    ok = rejects = mismatches = 0
    for name, (w, h, rgba) in sorted(refs.items()):
        g = got.get(name)
        if g is None or g == ["REJECT"]:
            rejects += 1
            print(f"  REJECT   {name}")
            continue
        gw, gh, hexpix = int(g[0]), int(g[1]), g[2]
        # libwebp returns RGBA bytes; the JVM side prints ARGB words
        want = "".join(
            f"{rgba[i+3]:02x}{rgba[i]:02x}{rgba[i+1]:02x}{rgba[i+2]:02x}"
            for i in range(0, len(rgba), 4))
        if (gw, gh) != (w, h) or hexpix != want:
            mismatches += 1
            print(f"  MISMATCH {name}")
        else:
            ok += 1
    print(f"[vp8l_diff] {ok} exact, {rejects} rejected, {mismatches} mismatched"
          f" of {len(refs)}")
    sys.exit(0 if rejects == 0 and mismatches == 0 else 1)


if __name__ == "__main__":
    main()
