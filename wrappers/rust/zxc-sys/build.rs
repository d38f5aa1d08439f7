// Links against the prebuilt libzxchost.so (built by the Python package
// or manually: g++ -O3 -march=native -shared -fPIC -o
// zxc_tpu/runtime/libzxchost.so zxc_tpu/runtime/zxc_host.cpp).
use std::path::PathBuf;

fn main() {
    let root = PathBuf::from(env!("CARGO_MANIFEST_DIR"))
        .join("../../..")
        .canonicalize()
        .expect("repo root");
    let dir = root.join("zxc_tpu/runtime");
    println!("cargo:rustc-link-search=native={}", dir.display());
    println!("cargo:rustc-link-lib=dylib=zxchost");
    println!("cargo:rustc-link-arg=-Wl,-rpath,{}", dir.display());
}
