//! Safe Rust binding for the zxc-tpu codec (reference-parity surface:
//! wrappers/rust/zxc — oneshot compress/decompress, frame info, seekable
//! range; errors map the ZXC error codes of include/zxc_error.h).
//!
//! ```no_run
//! let arc = zxc_tpu::compress(b"hello world", &Default::default())?;
//! let out = zxc_tpu::decompress(&arc, true)?;
//! # Ok::<(), zxc_tpu::Error>(())
//! ```

use zxc_tpu_sys as sys;

/// ZXC error code (negative values of the C ABI).
#[derive(Debug, Clone, Copy, PartialEq, Eq)]
pub struct Error(pub i64);

impl core::fmt::Display for Error {
    fn fmt(&self, f: &mut core::fmt::Formatter<'_>) -> core::fmt::Result {
        let name = match self.0 {
            -1 => "MEMORY",
            -2 => "DST_TOO_SMALL",
            -3 => "SRC_TOO_SMALL",
            -4 => "BAD_MAGIC",
            -5 => "BAD_VERSION",
            -6 => "BAD_HEADER",
            -7 => "BAD_CHECKSUM",
            -8 => "CORRUPT_DATA",
            -9 => "BAD_OFFSET",
            -10 => "OVERFLOW",
            -13 => "BAD_BLOCK_TYPE",
            -14 => "BAD_BLOCK_SIZE",
            -15 => "DICT_REQUIRED",
            -16 => "DICT_MISMATCH",
            _ => return write!(f, "zxc: error {}", self.0),
        };
        write!(f, "zxc: ZXC_ERROR_{}", name)
    }
}

impl std::error::Error for Error {}

fn check(rc: i64) -> Result<i64, Error> {
    if rc < 0 {
        Err(Error(rc))
    } else {
        Ok(rc)
    }
}

/// Compression options (builder-style struct, zero value = defaults).
#[derive(Debug, Clone)]
pub struct CompressOptions {
    /// 1..=7 (1-5 fast GHI/GLO; 6-7 archival DP optimal parse with
    /// Huffman literal/token sections, native since round 3).
    pub level: i32,
    /// Power of two 4 KiB..2 MiB; 0 selects the 512 KiB default.
    pub block_size: u64,
    pub checksum: bool,
    pub seekable: bool,
}

impl Default for CompressOptions {
    fn default() -> Self {
        Self { level: 3, block_size: 0, checksum: false, seekable: false }
    }
}

/// One-shot frame encode.
pub fn compress(data: &[u8], opts: &CompressOptions) -> Result<Vec<u8>, Error> {
    let bs = if opts.block_size == 0 { 512 * 1024 } else { opts.block_size };
    let cap = unsafe { sys::zxch_compress_bound(data.len() as u64, bs) };
    let cap = check(cap)? as usize;
    let mut dst = vec![0u8; cap];
    let w = unsafe {
        sys::zxch_simple_compress(
            data.as_ptr(),
            data.len() as u64,
            opts.level,
            opts.block_size,
            opts.checksum as i32,
            opts.seekable as i32,
            dst.as_mut_ptr(),
            cap as u64,
        )
    };
    let w = check(w)? as usize;
    dst.truncate(w);
    Ok(dst)
}

/// `compress` over the native multi-threaded frame encoder
/// (`zxch_simple_compress_mt`): archive bytes are identical to
/// `compress` at every thread count; `threads <= 1` runs sequentially.
pub fn compress_mt(data: &[u8], opts: &CompressOptions, threads: i32)
    -> Result<Vec<u8>, Error> {
    let bs = if opts.block_size == 0 { 512 * 1024 } else { opts.block_size };
    let cap = unsafe { sys::zxch_compress_bound(data.len() as u64, bs) };
    let cap = check(cap)? as usize;
    let mut dst = vec![0u8; cap];
    let w = unsafe {
        sys::zxch_simple_compress_mt(
            data.as_ptr(),
            data.len() as u64,
            opts.level,
            opts.block_size,
            opts.checksum as i32,
            opts.seekable as i32,
            dst.as_mut_ptr(),
            cap as u64,
            threads,
        )
    };
    let w = check(w)? as usize;
    dst.truncate(w);
    Ok(dst)
}

/// Shared compression dictionary: a parse-window prefix plus an
/// optional shared literal code table (256 unpacked per-symbol
/// lengths). Mirrors the reference crate's dictionary surface.
#[derive(Debug, Clone, Default)]
pub struct Dictionary {
    pub content: Vec<u8>,
    /// 256 per-symbol code lengths, or empty for content-only dicts.
    pub code_len: Vec<u8>,
}

impl Dictionary {
    fn cl_ptr(&self) -> *const u8 {
        if self.code_len.len() == 256 { self.code_len.as_ptr() }
        else { core::ptr::null() }
    }

    /// 32-bit id stamped into frame headers for this dictionary.
    pub fn id(&self) -> u32 {
        if self.content.is_empty() {
            return 0;
        }
        let packed: Option<[u8; 128]> = if self.code_len.len() == 256 {
            let mut p = [0u8; 128];
            for i in 0..128 {
                p[i] = (self.code_len[2 * i] & 0x0F)
                    | (self.code_len[2 * i + 1] << 4);
            }
            Some(p)
        } else {
            None
        };
        unsafe {
            sys::zxch_dict_id(
                self.content.as_ptr(),
                self.content.len() as u64,
                packed.as_ref().map_or(core::ptr::null(), |p| p.as_ptr()),
            )
        }
    }

    /// Train a dictionary from sample documents (reference
    /// `zxc_dict_train`): k-gram coverage selection + a shared literal
    /// table trained on the samples' post-LZ literal histogram.
    pub fn train(samples: &[&[u8]], target_size: usize) -> Result<Dictionary, Error> {
        let flat: Vec<u8> = samples.concat();
        let sizes: Vec<u64> = samples.iter().map(|s| s.len() as u64).collect();
        let cap = 16 + 65536 + 128;
        let mut blob = vec![0u8; cap];
        let n = unsafe {
            sys::zxch_dict_train(
                flat.as_ptr(),
                sizes.as_ptr(),
                samples.len() as i32,
                target_size as u64,
                blob.as_mut_ptr(),
                cap as u64,
            )
        };
        let n = check(n)? as usize;
        // .zxd layout: 16-byte header (content size LE at 6..8),
        // content, 128-byte nibble-packed shared table
        let csz = u16::from_le_bytes([blob[6], blob[7]]) as usize;
        let content = blob[16..16 + csz].to_vec();
        let packed = &blob[16 + csz..n];
        let mut code_len = vec![0u8; 256];
        for i in 0..128 {
            code_len[2 * i] = packed[i] & 0x0F;
            code_len[2 * i + 1] = packed[i] >> 4;
        }
        Ok(Dictionary { content, code_len })
    }
}

/// Frame encode against a shared dictionary (the dict id lands in the
/// header; decode with [`decompress_dict`] and the same dictionary).
pub fn compress_dict(
    data: &[u8],
    dict: &Dictionary,
    opts: &CompressOptions,
) -> Result<Vec<u8>, Error> {
    let bs = if opts.block_size == 0 { 512 * 1024 } else { opts.block_size };
    let cap = unsafe { sys::zxch_compress_bound(data.len() as u64, bs) };
    let cap = check(cap)? as usize;
    let mut dst = vec![0u8; cap];
    let w = unsafe {
        sys::zxch_simple_compress_dict(
            data.as_ptr(),
            data.len() as u64,
            opts.level,
            opts.block_size,
            opts.checksum as i32,
            opts.seekable as i32,
            dict.content.as_ptr(),
            dict.content.len() as u64,
            dict.cl_ptr(),
            dst.as_mut_ptr(),
            cap as u64,
        )
    };
    let w = check(w)? as usize;
    dst.truncate(w);
    Ok(dst)
}

/// Frame decode of a dictionary archive.
pub fn decompress_dict(
    archive: &[u8],
    dict: &Dictionary,
    verify: bool,
) -> Result<Vec<u8>, Error> {
    let bound = unsafe {
        sys::zxch_simple_decompress_bound(archive.as_ptr(),
                                          archive.len() as u64)
    };
    let bound = check(bound)? as usize;
    let mut dst = vec![0u8; bound + 1];
    let w = unsafe {
        sys::zxch_simple_decompress(
            archive.as_ptr(),
            archive.len() as u64,
            dst.as_mut_ptr(),
            bound as u64,
            dict.content.as_ptr(),
            dict.content.len() as u64,
            dict.cl_ptr(),
            verify as i32,
        )
    };
    let w = check(w)? as usize;
    dst.truncate(w);
    Ok(dst)
}

/// `seekable_range` for dictionary archives.
pub fn seekable_range_dict(
    archive: &[u8],
    offset: u64,
    length: u64,
    dict: &Dictionary,
) -> Result<Vec<u8>, Error> {
    let mut dst = vec![0u8; length as usize];
    let w = unsafe {
        sys::zxch_seekable_range(
            archive.as_ptr(),
            archive.len() as u64,
            offset,
            length,
            dst.as_mut_ptr(),
            length,
            dict.content.as_ptr(),
            dict.content.len() as u64,
            dict.cl_ptr(),
        )
    };
    let w = check(w)? as usize;
    dst.truncate(w);
    Ok(dst)
}

/// Footer-declared decompressed size of a validated archive.
pub fn get_decompressed_size(archive: &[u8]) -> Result<u64, Error> {
    let s = unsafe {
        sys::zxch_get_decompressed_size(archive.as_ptr(), archive.len() as u64)
    };
    check(s).map(|v| v as u64)
}

/// One-shot frame decode; `verify` enables checksum validation.
pub fn decompress(archive: &[u8], verify: bool) -> Result<Vec<u8>, Error> {
    let bound = unsafe {
        sys::zxch_simple_decompress_bound(archive.as_ptr(),
                                          archive.len() as u64)
    };
    let bound = check(bound)? as usize;
    let mut dst = vec![0u8; bound + 1];
    let w = unsafe {
        sys::zxch_simple_decompress(
            archive.as_ptr(),
            archive.len() as u64,
            dst.as_mut_ptr(),
            bound as u64,
            core::ptr::null(),
            0,
            core::ptr::null(),
            verify as i32,
        )
    };
    let w = check(w)? as usize;
    dst.truncate(w);
    Ok(dst)
}

/// `decompress` over the native multi-threaded frame decoder
/// (`zxch_simple_decompress_mt`): output bytes AND error codes are
/// identical to `decompress` at every thread count.
pub fn decompress_mt(archive: &[u8], verify: bool, threads: i32)
    -> Result<Vec<u8>, Error> {
    let bound = unsafe {
        sys::zxch_simple_decompress_bound(archive.as_ptr(),
                                          archive.len() as u64)
    };
    let bound = check(bound)? as usize;
    let mut dst = vec![0u8; bound + 1];
    let w = unsafe {
        sys::zxch_simple_decompress_mt(
            archive.as_ptr(),
            archive.len() as u64,
            dst.as_mut_ptr(),
            bound as u64,
            core::ptr::null(),
            0,
            core::ptr::null(),
            verify as i32,
            threads,
        )
    };
    let w = check(w)? as usize;
    dst.truncate(w);
    Ok(dst)
}

/// Validated file-header fields.
#[derive(Debug, Clone, Copy, PartialEq, Eq)]
pub struct FrameInfo {
    pub block_size: u64,
    pub has_checksum: bool,
    pub dict_id: u32,
}

/// Parse + validate the 16-byte file header.
pub fn frame_info(archive: &[u8]) -> Result<FrameInfo, Error> {
    let mut bs = 0u64;
    let mut ck = 0i32;
    let mut did = 0u32;
    let rc = unsafe {
        sys::zxch_frame_info(archive.as_ptr(), archive.len() as u64, &mut bs,
                             &mut ck, &mut did)
    };
    check(rc as i64)?;
    Ok(FrameInfo { block_size: bs, has_checksum: ck != 0, dict_id: did })
}

/// O(1) random-access range decode from a seekable archive.
pub fn seekable_range(archive: &[u8], offset: u64, length: u64)
                      -> Result<Vec<u8>, Error> {
    let mut dst = vec![0u8; length.max(1) as usize];
    let w = unsafe {
        sys::zxch_seekable_range(
            archive.as_ptr(),
            archive.len() as u64,
            offset,
            length,
            dst.as_mut_ptr(),
            length,
            core::ptr::null(),
            0,
            core::ptr::null(),
        )
    };
    let w = check(w)? as usize;
    dst.truncate(w);
    Ok(dst)
}


/// Push (pull-free) streaming compressor — `zxc_cstream_t` parity.
/// Reentrant: feed input with [`CStream::compress`], then call
/// [`CStream::end`] until [`CStream::finished`]. No dictionaries (the
/// push path has no dict_id handshake).
pub struct CStream(*mut core::ffi::c_void);

impl CStream {
    pub fn new(opts: &CompressOptions) -> Result<Self, Error> {
        let h = unsafe {
            sys::zxch_cstream_new(opts.level, opts.block_size,
                                  opts.checksum as i32,
                                  opts.seekable as i32)
        };
        if h.is_null() { return Err(Error(-14)); }
        Ok(CStream(h))
    }

    /// Consumes all of `src`, appends produced archive bytes to `out`.
    pub fn compress(&mut self, src: &[u8], out: &mut Vec<u8>)
        -> Result<(), Error> {
        let cap = unsafe { sys::zxch_cstream_out_size(self.0) } as usize;
        let mut buf = vec![0u8; cap];
        let mut consumed = 0u64;
        let mut pos = 0usize;
        loop {
            let n = check(unsafe {
                sys::zxch_cstream_compress(
                    self.0, src[pos..].as_ptr(), (src.len() - pos) as u64,
                    buf.as_mut_ptr(), cap as u64, &mut consumed)
            })? as usize;
            out.extend_from_slice(&buf[..n]);
            pos += consumed as usize;
            if pos >= src.len() && n < cap { return Ok(()); }
        }
    }

    /// Flushes the tail (final block, EOF, seek table, footer).
    pub fn end(&mut self, out: &mut Vec<u8>) -> Result<(), Error> {
        let cap = unsafe { sys::zxch_cstream_out_size(self.0) } as usize;
        let mut buf = vec![0u8; cap];
        while unsafe { sys::zxch_cstream_finished(self.0) } == 0 {
            let n = check(unsafe {
                sys::zxch_cstream_end(self.0, buf.as_mut_ptr(), cap as u64)
            })? as usize;
            out.extend_from_slice(&buf[..n]);
            if n == 0 { break; }
        }
        Ok(())
    }

    pub fn finished(&self) -> bool {
        unsafe { sys::zxch_cstream_finished(self.0) != 0 }
    }
}

impl Drop for CStream {
    fn drop(&mut self) { unsafe { sys::zxch_cstream_free(self.0) } }
}

/// Push streaming decompressor — `zxc_dstream_t` parity.
pub struct DStream(*mut core::ffi::c_void);

impl DStream {
    pub fn new(verify: bool) -> Self {
        DStream(unsafe { sys::zxch_dstream_new(verify as i32) })
    }

    /// Consumes all of `src`, appends decoded bytes to `out`.
    pub fn decompress(&mut self, src: &[u8], out: &mut Vec<u8>)
        -> Result<(), Error> {
        let mut consumed = 0u64;
        let mut first = true;
        loop {
            let cap = unsafe { sys::zxch_dstream_out_size(self.0) } as usize;
            let mut buf = vec![0u8; cap];
            let (ptr, len) = if first { (src.as_ptr(), src.len() as u64) }
                             else { (core::ptr::null(), 0u64) };
            let n = check(unsafe {
                sys::zxch_dstream_decompress(self.0, ptr, len,
                                             buf.as_mut_ptr(), cap as u64,
                                             &mut consumed)
            })? as usize;
            out.extend_from_slice(&buf[..n]);
            first = false;
            if n < cap { return Ok(()); }
        }
    }

    pub fn finished(&self) -> bool {
        unsafe { sys::zxch_dstream_finished(self.0) != 0 }
    }
}

impl Drop for DStream {
    fn drop(&mut self) { unsafe { sys::zxch_dstream_free(self.0) } }
}


/// Reusable compression context: sticky options + dictionary attached
/// once (`zxc_create_cctx` parity — the id/table work amortizes over
/// many frames).
pub struct Cctx(*mut core::ffi::c_void);

impl Cctx {
    pub fn new(opts: &CompressOptions) -> Result<Self, Error> {
        let h = unsafe { sys::zxch_cctx_new() };
        let rc = unsafe {
            sys::zxch_cctx_set(h, opts.level, opts.block_size,
                               opts.checksum as i32, opts.seekable as i32)
        };
        if rc < 0 {
            unsafe { sys::zxch_cctx_free(h) };
            return Err(Error(rc as i64));
        }
        Ok(Cctx(h))
    }

    /// Attach a dictionary (`packed128` = the .zxd 128-byte table).
    pub fn attach_dict(&mut self, dict: &[u8], packed128: Option<&[u8; 128]>)
        -> Result<(), Error> {
        let rc = unsafe {
            sys::zxch_cctx_attach_dict(
                self.0, dict.as_ptr(), dict.len() as u64,
                packed128.map_or(core::ptr::null(), |t| t.as_ptr()))
        };
        if rc < 0 { Err(Error(rc as i64)) } else { Ok(()) }
    }

    pub fn compress(&mut self, data: &[u8]) -> Result<Vec<u8>, Error> {
        let cap = check(unsafe {
            sys::zxch_compress_bound(data.len() as u64, 0)
        })? as usize;
        let mut dst = vec![0u8; cap];
        let w = check(unsafe {
            sys::zxch_cctx_compress(self.0, data.as_ptr(),
                                    data.len() as u64, dst.as_mut_ptr(),
                                    cap as u64)
        })? as usize;
        dst.truncate(w);
        Ok(dst)
    }
}

impl Drop for Cctx {
    fn drop(&mut self) { unsafe { sys::zxch_cctx_free(self.0) } }
}

/// Reusable decompression context (`zxc_create_dctx` parity).
pub struct Dctx(*mut core::ffi::c_void);

impl Dctx {
    pub fn new(verify: bool) -> Self {
        Dctx(unsafe { sys::zxch_dctx_new(verify as i32) })
    }

    pub fn attach_dict(&mut self, dict: &[u8], packed128: Option<&[u8; 128]>)
        -> Result<(), Error> {
        let rc = unsafe {
            sys::zxch_dctx_attach_dict(
                self.0, dict.as_ptr(), dict.len() as u64,
                packed128.map_or(core::ptr::null(), |t| t.as_ptr()))
        };
        if rc < 0 { Err(Error(rc as i64)) } else { Ok(()) }
    }

    pub fn decompress(&mut self, archive: &[u8]) -> Result<Vec<u8>, Error> {
        let cap = check(unsafe {
            sys::zxch_simple_decompress_bound(archive.as_ptr(),
                                              archive.len() as u64)
        })? as usize;
        let mut dst = vec![0u8; cap];
        let w = check(unsafe {
            sys::zxch_dctx_decompress(self.0, archive.as_ptr(),
                                      archive.len() as u64,
                                      dst.as_mut_ptr(), cap as u64)
        })? as usize;
        dst.truncate(w);
        Ok(dst)
    }
}

impl Drop for Dctx {
    fn drop(&mut self) { unsafe { sys::zxch_dctx_free(self.0) } }
}

#[cfg(test)]
mod tests {
    use super::*;

    fn corpus() -> Vec<u8> {
        let mut v = b"the quick brown fox ".repeat(4000);
        v.extend((0..50000u32).map(|i| ((i * 7) % 251) as u8));
        v
    }

    #[test]
    fn roundtrip_all_levels() {
        let data = corpus();
        for level in [1, 2, 3, 5] {
            let arc = compress(&data, &CompressOptions {
                level, checksum: true, seekable: true, ..Default::default()
            }).unwrap();
            assert!(arc.len() < data.len());
            assert_eq!(get_decompressed_size(&arc).unwrap(),
                       data.len() as u64);
            assert_eq!(decompress(&arc, true).unwrap(), data);
            assert_eq!(seekable_range(&arc, 60000, 5000).unwrap(),
                       &data[60000..65000]);
            assert!(frame_info(&arc).unwrap().has_checksum);
        }
    }

    #[test]
    fn dict_roundtrip() {
        let dict = Dictionary {
            content: b"json rows with common keys ".repeat(80),
            code_len: Vec::new(),
        };
        let data = b"json rows with common keys and payload 42 ".repeat(100);
        let arc = compress_dict(&data, &dict, &CompressOptions {
            checksum: true, ..Default::default()
        }).unwrap();
        let info = frame_info(&arc).unwrap();
        assert_ne!(info.dict_id, 0);
        assert_eq!(info.dict_id, dict.id());
        assert_eq!(decompress_dict(&arc, &dict, true).unwrap(), data);
        // decoding without the dictionary must fail (DICT_REQUIRED)
        assert!(decompress(&arc, true).is_err());
    }

    #[test]
    fn dict_train() {
        let samples: Vec<Vec<u8>> = (0..12)
            .map(|i| b"json rows with common keys and payload ".repeat(20 + i))
            .collect();
        let refs: Vec<&[u8]> = samples.iter().map(|s| s.as_slice()).collect();
        let dict = Dictionary::train(&refs, 4096).unwrap();
        assert!(!dict.content.is_empty());
        assert_eq!(dict.code_len.len(), 256);
        let data = &samples[0];
        let opts = CompressOptions { block_size: 4096, ..Default::default() };
        let plain = compress(data, &opts).unwrap();
        let arc = compress_dict(data, &dict, &opts).unwrap();
        assert!(arc.len() < plain.len(), "trained dict must improve ratio");
        assert_eq!(decompress_dict(&arc, &dict, true).unwrap(), *data);
        assert!(Dictionary::train(&[], 1024).is_err());
    }

    #[test]
    fn corrupt_rejected() {
        let data = corpus();
        let arc = compress(&data, &CompressOptions {
            checksum: true, ..Default::default()
        }).unwrap();
        assert!(decompress(&arc[..40], true).is_err());
        let mut bad = arc.clone();
        bad[100] ^= 0xFF;
        assert!(decompress(&bad, true).is_err());
    }
}
