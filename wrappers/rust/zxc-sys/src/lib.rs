//! Raw FFI declarations for the zxc-tpu simple C ABI
//! (include/zxc_host.h). Hand-written (no bindgen dependency); the
//! signatures are guarded by the repo's C consumer test
//! (tests/test_runtime_native.py).
#![no_std]
#![allow(non_camel_case_types)]

extern "C" {
    pub fn zxch_cctx_new() -> *mut core::ffi::c_void;
    pub fn zxch_cctx_set(
        h: *mut core::ffi::c_void,
        level: i32,
        block_size: u64,
        checksum: i32,
        seekable: i32,
    ) -> i32;
    pub fn zxch_cctx_attach_dict(
        h: *mut core::ffi::c_void,
        dict: *const u8,
        n: u64,
        packed128: *const u8,
    ) -> i32;
    pub fn zxch_cctx_compress(
        h: *mut core::ffi::c_void,
        src: *const u8,
        n: u64,
        dst: *mut u8,
        cap: u64,
    ) -> i64;
    pub fn zxch_cctx_free(h: *mut core::ffi::c_void);
    pub fn zxch_dctx_new(verify: i32) -> *mut core::ffi::c_void;
    pub fn zxch_dctx_attach_dict(
        h: *mut core::ffi::c_void,
        dict: *const u8,
        n: u64,
        packed128: *const u8,
    ) -> i32;
    pub fn zxch_dctx_decompress(
        h: *mut core::ffi::c_void,
        src: *const u8,
        n: u64,
        dst: *mut u8,
        cap: u64,
    ) -> i64;
    pub fn zxch_dctx_free(h: *mut core::ffi::c_void);
    pub fn zxch_cstream_new(
        level: i32,
        block_size: u64,
        checksum: i32,
        seekable: i32,
    ) -> *mut core::ffi::c_void;
    pub fn zxch_cstream_compress(
        h: *mut core::ffi::c_void,
        src: *const u8,
        n: u64,
        dst: *mut u8,
        cap: u64,
        consumed: *mut u64,
    ) -> i64;
    pub fn zxch_cstream_end(
        h: *mut core::ffi::c_void,
        dst: *mut u8,
        cap: u64,
    ) -> i64;
    pub fn zxch_cstream_finished(h: *mut core::ffi::c_void) -> i32;
    pub fn zxch_cstream_in_size(h: *mut core::ffi::c_void) -> u64;
    pub fn zxch_cstream_out_size(h: *mut core::ffi::c_void) -> u64;
    pub fn zxch_cstream_free(h: *mut core::ffi::c_void);
    pub fn zxch_dstream_new(verify: i32) -> *mut core::ffi::c_void;
    pub fn zxch_dstream_decompress(
        h: *mut core::ffi::c_void,
        src: *const u8,
        n: u64,
        dst: *mut u8,
        cap: u64,
        consumed: *mut u64,
    ) -> i64;
    pub fn zxch_dstream_finished(h: *mut core::ffi::c_void) -> i32;
    pub fn zxch_dstream_out_size(h: *mut core::ffi::c_void) -> u64;
    pub fn zxch_dstream_free(h: *mut core::ffi::c_void);
    pub fn zxch_rapidhash32(data: *const u8, len: usize, seed: u64) -> u32;
    pub fn zxch_frame_info(
        src: *const u8,
        n: u64,
        block_size: *mut u64,
        has_checksum: *mut i32,
        dict_id: *mut u32,
    ) -> i32;
    pub fn zxch_get_decompressed_size(src: *const u8, n: u64) -> i64;
    pub fn zxch_simple_decompress_bound(src: *const u8, n: u64) -> i64;
    pub fn zxch_simple_decompress(
        src: *const u8,
        n: u64,
        dst: *mut u8,
        dst_cap: u64,
        dict: *const u8,
        n_dict: u64,
        dict_cl256: *const u8,
        verify: i32,
    ) -> i64;
    pub fn zxch_compress_bound(n: u64, block_size: u64) -> i64;
    pub fn zxch_dict_train(
        flat: *const u8,
        sizes: *const u64,
        n_samples: i32,
        target_size: u64,
        out: *mut u8,
        cap: u64,
    ) -> i64;
    pub fn zxch_dict_id(content: *const u8, n: u64, huf128: *const u8)
        -> u32;
    pub fn zxch_simple_compress_dict(
        data: *const u8,
        n: u64,
        level: i32,
        block_size: u64,
        checksum: i32,
        seekable: i32,
        dict: *const u8,
        n_dict: u64,
        dict_cl256: *const u8,
        dst: *mut u8,
        dst_cap: u64,
    ) -> i64;
    pub fn zxch_simple_compress(
        data: *const u8,
        n: u64,
        level: i32,
        block_size: u64,
        checksum: i32,
        seekable: i32,
        dst: *mut u8,
        dst_cap: u64,
    ) -> i64;
    pub fn zxch_simple_compress_mt(
        data: *const u8,
        n: u64,
        level: i32,
        block_size: u64,
        checksum: i32,
        seekable: i32,
        dst: *mut u8,
        dst_cap: u64,
        threads: i32,
    ) -> i64;
    pub fn zxch_simple_decompress_mt(
        src: *const u8,
        n: u64,
        dst: *mut u8,
        dst_cap: u64,
        dict: *const u8,
        n_dict: u64,
        dict_cl256: *const u8,
        verify: i32,
        threads: i32,
    ) -> i64;
    pub fn zxch_seekable_range(
        src: *const u8,
        n: u64,
        offset: u64,
        length: u64,
        dst: *mut u8,
        dst_cap: u64,
        dict: *const u8,
        n_dict: u64,
        dict_cl256: *const u8,
    ) -> i64;
}
