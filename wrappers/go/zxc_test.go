package zxc

import (
	"bytes"
	"strings"
	"testing"
)

func corpus() []byte {
	text := strings.Repeat("the quick brown fox jumps over the dog ", 3000)
	bin := make([]byte, 60000)
	for i := range bin {
		bin[i] = byte((i * 7) % 251)
	}
	return append([]byte(text), bin...)
}

func TestRoundtrip(t *testing.T) {
	data := corpus()
	for _, level := range []int{1, 2, 3, 5} {
		arc, err := Compress(data, &CompressOptions{
			Level: level, Checksum: true, Seekable: true})
		if err != nil {
			t.Fatalf("level %d: compress: %v", level, err)
		}
		if len(arc) >= len(data) {
			t.Fatalf("level %d: no compression (%d >= %d)", level,
				len(arc), len(data))
		}
		if s, err := GetDecompressedSize(arc); err != nil || s != int64(len(data)) {
			t.Fatalf("level %d: size %d err %v", level, s, err)
		}
		out, err := Decompress(arc, true)
		if err != nil || !bytes.Equal(out, data) {
			t.Fatalf("level %d: roundtrip mismatch (err %v)", level, err)
		}
		slice, err := SeekableRange(arc, 60000, 5000)
		if err != nil || !bytes.Equal(slice, data[60000:65000]) {
			t.Fatalf("level %d: range mismatch (err %v)", level, err)
		}
		info, err := Info(arc)
		if err != nil || !info.HasChecksum {
			t.Fatalf("level %d: info %+v err %v", level, info, err)
		}
	}
}

func TestCorruptRejected(t *testing.T) {
	data := corpus()
	arc, _ := Compress(data, &CompressOptions{Level: 3, Checksum: true})
	for _, bad := range [][]byte{arc[:40], {1, 2, 3}, {}} {
		if _, err := Decompress(bad, true); err == nil {
			t.Fatalf("truncated archive accepted")
		}
	}
	mut := append([]byte(nil), arc...)
	mut[100] ^= 0xFF
	if _, err := Decompress(mut, true); err == nil {
		t.Fatalf("corrupted archive accepted")
	}
}

func TestDictionaryRoundtrip(t *testing.T) {
	dict := &Dictionary{Content: bytes.Repeat([]byte("shared dict content: json rows with common keys "), 40)}
	data := bytes.Repeat([]byte("json rows with common keys and payload 12345 "), 30)
	arc, err := CompressDict(data, dict, &CompressOptions{Level: 3, Checksum: true})
	if err != nil {
		t.Fatal(err)
	}
	info, err := Info(arc)
	if err != nil || info.DictID == 0 || info.DictID != dict.ID() {
		t.Fatalf("dict id: %v %v vs %v", err, info.DictID, dict.ID())
	}
	out, err := DecompressDict(arc, dict, true)
	if err != nil || !bytes.Equal(out, data) {
		t.Fatalf("dict roundtrip: %v", err)
	}
	if _, err := Decompress(arc, true); err == nil {
		t.Fatal("decode without dict must fail")
	}
}

func TestTrainDictionary(t *testing.T) {
	var samples [][]byte
	for i := 0; i < 12; i++ {
		samples = append(samples, bytes.Repeat(
			[]byte("json rows with common keys and payload "), 20+i))
	}
	dict, err := TrainDictionary(samples, 4096)
	if err != nil || len(dict.Content) == 0 || len(dict.CodeLen) != 256 {
		t.Fatalf("train: %v (%d content)", err, len(dict.Content))
	}
	data := samples[0]
	plain, _ := Compress(data, &CompressOptions{Level: 3, BlockSize: 4096})
	arc, err := CompressDict(data, dict, &CompressOptions{Level: 3, BlockSize: 4096})
	if err != nil || len(arc) >= len(plain) {
		t.Fatalf("trained dict must improve ratio: %v (%d vs %d)", err, len(arc), len(plain))
	}
	out, err := DecompressDict(arc, dict, true)
	if err != nil || !bytes.Equal(out, data) {
		t.Fatalf("trained dict roundtrip: %v", err)
	}
	if _, err := TrainDictionary(nil, 1024); err == nil {
		t.Fatal("empty samples must fail")
	}
}
