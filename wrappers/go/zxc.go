// Package zxc is the Go binding for the zxc-tpu codec (ZXC v7 bitstream).
//
// It wraps the simple one-call C ABI of libzxchost.so
// (include/zxc_host.h; reference-parity surface: wrappers/go/zxc.go):
// Compress / Decompress / GetDecompressedSize / FrameInfo / SeekableRange.
//
// Build: the shared library must be built first (importing the Python
// package once does it, or: g++ -O3 -march=native -shared -fPIC \
// -o zxc_tpu/runtime/libzxchost.so zxc_tpu/runtime/zxc_host.cpp).
package zxc

/*
#cgo CFLAGS: -I${SRCDIR}/../../include
#cgo LDFLAGS: ${SRCDIR}/../../zxc_tpu/runtime/libzxchost.so -Wl,-rpath,${SRCDIR}/../../zxc_tpu/runtime
#include <stdlib.h>
#include "zxc_host.h"
*/
import "C"

import (
	"fmt"
	"unsafe"
)

// Error is a ZXC error code (include/zxc_error.h semantics).
type Error int64

var errNames = map[int64]string{
	-1: "MEMORY", -2: "DST_TOO_SMALL", -3: "SRC_TOO_SMALL", -4: "BAD_MAGIC",
	-5: "BAD_VERSION", -6: "BAD_HEADER", -7: "BAD_CHECKSUM",
	-8: "CORRUPT_DATA", -9: "BAD_OFFSET", -10: "OVERFLOW", -11: "IO",
	-12: "NULL_INPUT", -13: "BAD_BLOCK_TYPE", -14: "BAD_BLOCK_SIZE",
	-15: "DICT_REQUIRED", -16: "DICT_MISMATCH", -17: "DICT_TOO_LARGE",
	-18: "BAD_LEVEL",
}

func (e Error) Error() string {
	if n, ok := errNames[int64(e)]; ok {
		return "zxc: ZXC_ERROR_" + n
	}
	return fmt.Sprintf("zxc: error %d", int64(e))
}

// CompressOptions configures Compress (options-pattern, reference parity).
type CompressOptions struct {
	Level     int    // 1..7 (0 = default 3; 6-7 = archival)
	BlockSize uint64 // power of two 4KB..2MB (0 = 512KB default)
	Checksum  bool
	Seekable  bool
}

func ptr(b []byte) *C.uint8_t {
	if len(b) == 0 {
		return (*C.uint8_t)(unsafe.Pointer(&[]byte{0}[0]))
	}
	return (*C.uint8_t)(unsafe.Pointer(&b[0]))
}

func boolInt(b bool) C.int {
	if b {
		return 1
	}
	return 0
}

// Compress encodes data into a ZXC v7 frame.
func Compress(data []byte, opts *CompressOptions) ([]byte, error) {
	o := CompressOptions{Level: 3}
	if opts != nil {
		o = *opts
	}
	if o.Level == 0 {
		o.Level = 3
	}
	bs := o.BlockSize
	if bs == 0 {
		bs = 512 * 1024
	}
	cap := int64(C.zxch_compress_bound(C.uint64_t(len(data)), C.uint64_t(bs)))
	dst := make([]byte, cap)
	w := int64(C.zxch_simple_compress(ptr(data), C.uint64_t(len(data)),
		C.int(o.Level), C.uint64_t(o.BlockSize), boolInt(o.Checksum),
		boolInt(o.Seekable), ptr(dst), C.uint64_t(len(dst))))
	if w < 0 {
		return nil, Error(w)
	}
	return dst[:w], nil
}

// CompressMT is Compress over the native multi-threaded frame encoder
// (zxch_simple_compress_mt): archive bytes are identical to Compress
// at every thread count; threads <= 1 runs sequentially.
func CompressMT(data []byte, opts *CompressOptions, threads int) ([]byte, error) {
	o := CompressOptions{Level: 3}
	if opts != nil {
		o = *opts
	}
	if o.Level == 0 {
		o.Level = 3
	}
	bs := o.BlockSize
	if bs == 0 {
		bs = 512 * 1024
	}
	cap := int64(C.zxch_compress_bound(C.uint64_t(len(data)), C.uint64_t(bs)))
	dst := make([]byte, cap)
	w := int64(C.zxch_simple_compress_mt(ptr(data), C.uint64_t(len(data)),
		C.int(o.Level), C.uint64_t(o.BlockSize), boolInt(o.Checksum),
		boolInt(o.Seekable), ptr(dst), C.uint64_t(len(dst)),
		C.int(threads)))
	if w < 0 {
		return nil, Error(w)
	}
	return dst[:w], nil
}

// GetDecompressedSize returns the footer-declared size of an archive.
func GetDecompressedSize(archive []byte) (int64, error) {
	s := int64(C.zxch_get_decompressed_size(ptr(archive),
		C.uint64_t(len(archive))))
	if s < 0 {
		return 0, Error(s)
	}
	return s, nil
}

// Decompress decodes a full archive (verify enables checksum validation).
func Decompress(archive []byte, verify bool) ([]byte, error) {
	bound := int64(C.zxch_simple_decompress_bound(ptr(archive),
		C.uint64_t(len(archive))))
	if bound < 0 {
		return nil, Error(bound)
	}
	dst := make([]byte, bound+1)
	w := int64(C.zxch_simple_decompress(ptr(archive),
		C.uint64_t(len(archive)), ptr(dst), C.uint64_t(bound), nil, 0, nil,
		boolInt(verify)))
	if w < 0 {
		return nil, Error(w)
	}
	return dst[:w], nil
}

// DecompressMT is Decompress over the native multi-threaded frame
// decoder (zxch_simple_decompress_mt): output bytes AND error codes
// are identical to Decompress at every thread count.
func DecompressMT(archive []byte, verify bool, threads int) ([]byte, error) {
	bound := int64(C.zxch_simple_decompress_bound(ptr(archive),
		C.uint64_t(len(archive))))
	if bound < 0 {
		return nil, Error(bound)
	}
	dst := make([]byte, bound+1)
	w := int64(C.zxch_simple_decompress_mt(ptr(archive),
		C.uint64_t(len(archive)), ptr(dst), C.uint64_t(bound), nil, 0, nil,
		boolInt(verify), C.int(threads)))
	if w < 0 {
		return nil, Error(w)
	}
	return dst[:w], nil
}

// FrameInfo holds the validated file-header fields.
type FrameInfo struct {
	BlockSize   uint64
	HasChecksum bool
	DictID      uint32
}

// Info parses and validates the archive's file header.
func Info(archive []byte) (FrameInfo, error) {
	var bs C.uint64_t
	var ck C.int
	var did C.uint32_t
	rc := int64(C.zxch_frame_info(ptr(archive), C.uint64_t(len(archive)),
		&bs, &ck, &did))
	if rc != 0 {
		return FrameInfo{}, Error(rc)
	}
	return FrameInfo{uint64(bs), ck != 0, uint32(did)}, nil
}

// SeekableRange decodes [offset, offset+length) from a seekable archive
// in O(blocks touched), not O(archive).
func SeekableRange(archive []byte, offset, length uint64) ([]byte, error) {
	if length == 0 {
		return nil, nil
	}
	dst := make([]byte, length)
	w := int64(C.zxch_seekable_range(ptr(archive), C.uint64_t(len(archive)),
		C.uint64_t(offset), C.uint64_t(length), ptr(dst),
		C.uint64_t(length), nil, 0, nil))
	if w < 0 {
		return nil, Error(w)
	}
	return dst[:w], nil
}

// Dictionary is a shared compression dictionary: a parse-window prefix
// plus an optional shared literal code table (256 per-symbol lengths,
// unpacked form; nil for a content-only dictionary). Mirrors the
// reference Go wrapper's dictionary surface (wrappers/go/zxc_dict.go).
type Dictionary struct {
	Content []byte
	CodeLen []byte // 256 entries or nil
}

func (d *Dictionary) clPtr() *C.uint8_t {
	if d == nil || len(d.CodeLen) != 256 {
		return nil
	}
	return ptr(d.CodeLen)
}

// ID returns the 32-bit dictionary id stamped into frame headers.
func (d *Dictionary) ID() uint32 {
	if d == nil || len(d.Content) == 0 {
		return 0
	}
	var huf *C.uint8_t
	var packed [128]byte
	if len(d.CodeLen) == 256 {
		for i := 0; i < 128; i++ {
			packed[i] = (d.CodeLen[2*i] & 0x0F) | (d.CodeLen[2*i+1] << 4)
		}
		huf = (*C.uint8_t)(unsafe.Pointer(&packed[0]))
	}
	return uint32(C.zxch_dict_id(ptr(d.Content),
		C.uint64_t(len(d.Content)), huf))
}

// TrainDictionary trains a dictionary from sample documents (reference
// zxc_dict_train): k-gram coverage selection plus a shared literal table
// trained on the samples' post-LZ literal histogram.
func TrainDictionary(samples [][]byte, targetSize int) (*Dictionary, error) {
	if len(samples) == 0 {
		return nil, Error(-12)
	}
	var flat []byte
	sizes := make([]uint64, len(samples))
	for i, s := range samples {
		flat = append(flat, s...)
		sizes[i] = uint64(len(s))
	}
	cap64 := uint64(16 + 65536 + 128)
	blob := make([]byte, cap64)
	n := int64(C.zxch_dict_train(ptr(flat),
		(*C.uint64_t)(unsafe.Pointer(&sizes[0])), C.int(len(samples)),
		C.uint64_t(targetSize), ptr(blob), C.uint64_t(cap64)))
	if n < 0 {
		return nil, Error(n)
	}
	// .zxd layout: 16-byte header (content size LE at 6..8), content,
	// 128-byte nibble-packed shared table
	csz := int(blob[6]) | int(blob[7])<<8
	content := append([]byte(nil), blob[16:16+csz]...)
	packed := blob[16+csz : n]
	codeLen := make([]byte, 256)
	for i := 0; i < 128; i++ {
		codeLen[2*i] = packed[i] & 0x0F
		codeLen[2*i+1] = packed[i] >> 4
	}
	return &Dictionary{Content: content, CodeLen: codeLen}, nil
}

// CompressDict encodes data against a shared dictionary; the dict id is
// stamped into the header and DecompressDict must receive the same dict.
func CompressDict(data []byte, d *Dictionary, opts *CompressOptions) ([]byte, error) {
	o := CompressOptions{Level: 3}
	if opts != nil {
		o = *opts
	}
	if o.Level == 0 {
		o.Level = 3
	}
	bs := o.BlockSize
	if bs == 0 {
		bs = 512 * 1024
	}
	cap := int64(C.zxch_compress_bound(C.uint64_t(len(data)), C.uint64_t(bs)))
	dst := make([]byte, cap)
	var dc *C.uint8_t
	var dn C.uint64_t
	if d != nil && len(d.Content) > 0 {
		dc = ptr(d.Content)
		dn = C.uint64_t(len(d.Content))
	}
	w := int64(C.zxch_simple_compress_dict(ptr(data), C.uint64_t(len(data)),
		C.int(o.Level), C.uint64_t(o.BlockSize), boolInt(o.Checksum),
		boolInt(o.Seekable), dc, dn, d.clPtr(),
		ptr(dst), C.uint64_t(len(dst))))
	if w < 0 {
		return nil, Error(w)
	}
	return dst[:w], nil
}

// DecompressDict decodes an archive produced with a shared dictionary.
func DecompressDict(archive []byte, d *Dictionary, verify bool) ([]byte, error) {
	bound := int64(C.zxch_simple_decompress_bound(ptr(archive),
		C.uint64_t(len(archive))))
	if bound < 0 {
		return nil, Error(bound)
	}
	dst := make([]byte, bound+1)
	var dc *C.uint8_t
	var dn C.uint64_t
	if d != nil && len(d.Content) > 0 {
		dc = ptr(d.Content)
		dn = C.uint64_t(len(d.Content))
	}
	w := int64(C.zxch_simple_decompress(ptr(archive),
		C.uint64_t(len(archive)), ptr(dst), C.uint64_t(bound), dc, dn,
		d.clPtr(), boolInt(verify)))
	if w < 0 {
		return nil, Error(w)
	}
	return dst[:w], nil
}

// SeekableRangeDict is SeekableRange for dictionary archives.
func SeekableRangeDict(archive []byte, offset, length uint64, d *Dictionary) ([]byte, error) {
	if length == 0 {
		return nil, nil
	}
	dst := make([]byte, length)
	var dc *C.uint8_t
	var dn C.uint64_t
	if d != nil && len(d.Content) > 0 {
		dc = ptr(d.Content)
		dn = C.uint64_t(len(d.Content))
	}
	w := int64(C.zxch_seekable_range(ptr(archive), C.uint64_t(len(archive)),
		C.uint64_t(offset), C.uint64_t(length), ptr(dst),
		C.uint64_t(length), dc, dn, d.clPtr()))
	if w < 0 {
		return nil, Error(w)
	}
	return dst[:w], nil
}

// CStream is a push (caller-driven) streaming compressor — the
// zxc_cstream_t parity surface. Feed input with Compress, then call End
// until Finished. Dictionaries are unsupported on the push path.
type CStream struct{ h unsafe.Pointer }

// NewCStream creates a push compressor (level 1..7; blockSize 0 = 512 KiB).
func NewCStream(level int, blockSize uint64, checksum, seekable bool) (*CStream, error) {
	h := C.zxch_cstream_new(C.int(level), C.uint64_t(blockSize),
		boolInt(checksum), boolInt(seekable))
	if h == nil {
		return nil, Error(-14)
	}
	return &CStream{h}, nil
}

// Compress consumes all of src and returns any produced archive bytes.
func (s *CStream) Compress(src []byte) ([]byte, error) {
	cap := uint64(C.zxch_cstream_out_size(s.h))
	out := []byte{}
	buf := make([]byte, cap)
	var consumed C.uint64_t
	pos := 0
	for {
		var sp *C.uint8_t
		if pos < len(src) {
			sp = ptr(src[pos:])
		}
		n := int64(C.zxch_cstream_compress(s.h, sp,
			C.uint64_t(len(src)-pos), ptr(buf), C.uint64_t(cap), &consumed))
		if n < 0 {
			return nil, Error(n)
		}
		out = append(out, buf[:n]...)
		pos += int(consumed)
		if pos >= len(src) && uint64(n) < cap {
			return out, nil
		}
	}
}

// End flushes the final partial block, EOF, seek table and footer.
func (s *CStream) End() ([]byte, error) {
	cap := uint64(C.zxch_cstream_out_size(s.h))
	out := []byte{}
	buf := make([]byte, cap)
	for C.zxch_cstream_finished(s.h) == 0 {
		n := int64(C.zxch_cstream_end(s.h, ptr(buf), C.uint64_t(cap)))
		if n < 0 {
			return nil, Error(n)
		}
		out = append(out, buf[:n]...)
		if n == 0 {
			break
		}
	}
	return out, nil
}

// Finished reports whether the footer was emitted and fully drained.
func (s *CStream) Finished() bool { return C.zxch_cstream_finished(s.h) != 0 }

// Close frees the native stream state.
func (s *CStream) Close() { C.zxch_cstream_free(s.h); s.h = nil }

// DStream is the push streaming decompressor (zxc_dstream_t parity).
type DStream struct{ h unsafe.Pointer }

// NewDStream creates a push decompressor; verify enables checksums.
func NewDStream(verify bool) *DStream {
	return &DStream{C.zxch_dstream_new(boolInt(verify))}
}

// Decompress consumes all of src and returns any decoded bytes.
func (s *DStream) Decompress(src []byte) ([]byte, error) {
	out := []byte{}
	var consumed C.uint64_t
	first := true
	for {
		cap := uint64(C.zxch_dstream_out_size(s.h))
		buf := make([]byte, cap)
		var sp *C.uint8_t
		var sn C.uint64_t
		if first && len(src) > 0 {
			sp = ptr(src)
			sn = C.uint64_t(len(src))
		}
		n := int64(C.zxch_dstream_decompress(s.h, sp, sn, ptr(buf),
			C.uint64_t(cap), &consumed))
		if n < 0 {
			return nil, Error(n)
		}
		out = append(out, buf[:n]...)
		first = false
		if uint64(n) < cap {
			return out, nil
		}
	}
}

// Finished reports whether the footer was consumed and output drained.
func (s *DStream) Finished() bool { return C.zxch_dstream_finished(s.h) != 0 }

// Close frees the native stream state.
func (s *DStream) Close() { C.zxch_dstream_free(s.h); s.h = nil }

// Cctx is a reusable compression context: sticky options plus a
// dictionary attached once (zxc_create_cctx parity).
type Cctx struct{ h unsafe.Pointer }

// NewCctx creates a context with sticky options.
func NewCctx(o CompressOptions) (*Cctx, error) {
	h := C.zxch_cctx_new()
	if o.Level == 0 {
		o.Level = 3
	}
	rc := int64(C.zxch_cctx_set(h, C.int(o.Level), C.uint64_t(o.BlockSize),
		boolInt(o.Checksum), boolInt(o.Seekable)))
	if rc < 0 {
		C.zxch_cctx_free(h)
		return nil, Error(rc)
	}
	return &Cctx{h}, nil
}

// AttachDict copies the dictionary into the context (packed128 is the
// .zxd 128-byte shared table, or nil for content-only).
func (c *Cctx) AttachDict(dict, packed128 []byte) error {
	var tp *C.uint8_t
	if packed128 != nil {
		tp = ptr(packed128)
	}
	rc := int64(C.zxch_cctx_attach_dict(c.h, ptr(dict),
		C.uint64_t(len(dict)), tp))
	if rc < 0 {
		return Error(rc)
	}
	return nil
}

// Compress encodes one frame under the context's sticky options.
func (c *Cctx) Compress(data []byte) ([]byte, error) {
	cap := int64(C.zxch_compress_bound(C.uint64_t(len(data)), 0))
	if cap < 0 {
		return nil, Error(cap)
	}
	dst := make([]byte, cap)
	w := int64(C.zxch_cctx_compress(c.h, ptr(data), C.uint64_t(len(data)),
		ptr(dst), C.uint64_t(cap)))
	if w < 0 {
		return nil, Error(w)
	}
	return dst[:w], nil
}

// Close frees the native context.
func (c *Cctx) Close() { C.zxch_cctx_free(c.h); c.h = nil }

// Dctx is a reusable decompression context (zxc_create_dctx parity).
type Dctx struct{ h unsafe.Pointer }

// NewDctx creates a decode context; verify enables checksum checks.
func NewDctx(verify bool) *Dctx {
	return &Dctx{C.zxch_dctx_new(boolInt(verify))}
}

// AttachDict copies the dictionary into the context.
func (d *Dctx) AttachDict(dict, packed128 []byte) error {
	var tp *C.uint8_t
	if packed128 != nil {
		tp = ptr(packed128)
	}
	rc := int64(C.zxch_dctx_attach_dict(d.h, ptr(dict),
		C.uint64_t(len(dict)), tp))
	if rc < 0 {
		return Error(rc)
	}
	return nil
}

// Decompress decodes one frame under the context's sticky options.
func (d *Dctx) Decompress(archive []byte) ([]byte, error) {
	bound := int64(C.zxch_simple_decompress_bound(ptr(archive),
		C.uint64_t(len(archive))))
	if bound < 0 {
		return nil, Error(bound)
	}
	dst := make([]byte, bound+1)
	w := int64(C.zxch_dctx_decompress(d.h, ptr(archive),
		C.uint64_t(len(archive)), ptr(dst), C.uint64_t(bound)))
	if w < 0 {
		return nil, Error(w)
	}
	return dst[:w], nil
}

// Close frees the native context.
func (d *Dctx) Close() { C.zxch_dctx_free(d.h); d.h = nil }
