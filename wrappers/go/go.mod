module github.com/zxc-tpu/zxc

go 1.21
