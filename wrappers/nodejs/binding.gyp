{
  "targets": [
    {
      "target_name": "zxc_addon",
      "sources": ["src/zxc_addon.c"],
      "include_dirs": ["../../include"],
      "libraries": [
        "<(module_root_dir)/../../zxc_tpu/runtime/libzxchost.so",
        "-Wl,-rpath,<(module_root_dir)/../../zxc_tpu/runtime"
      ],
      "cflags": ["-O2"]
    }
  ]
}
