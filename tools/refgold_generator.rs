// Golden-file generator: build small U64 CQFs through the reference
// implementation and let new_file/Drop persist the exact mmap image
// (Metadata ‖ Blocks). The graft repo's RefLayoutSpec asserts its
// exportRefLayout reproduces these bytes and importRefLayout reads them.
use cqfrs::*;
use std::fs::OpenOptions;

fn open(path: &str) -> std::fs::File {
    OpenOptions::new()
        .read(true)
        .write(true)
        .create(true)
        .truncate(true)
        .open(path)
        .unwrap()
}

fn main() {
    // A: layout-only golden — explicit hashes via insert_by_hash.
    // q=8, hash_bits=20, invertable=false. Deterministic xorshift hash
    // set with mixed counts (1 and >1), inserted in UNSORTED order to
    // also witness that the final layout is history-independent.
    {
        let mut a = U64Cqf::new_file(
            8,
            20,
            false,
            BuildReversableHasher::<20>::default(),
            open("/tmp/refgold_a.cqf"),
        )
        .unwrap();
        let mut seed: u64 = 0x243f6a8885a308d3;
        let mut seen = std::collections::HashSet::new();
        let mut n = 0u32;
        while n < 90 {
            seed ^= seed << 13;
            seed ^= seed >> 7;
            seed ^= seed << 17;
            let h = seed & ((1 << 20) - 1);
            if seen.insert(h) {
                let count = 1 + (seed >> 60); // 1..=16
                a.insert_by_hash(h, count).unwrap();
                n += 1;
            }
        }
        println!("A: occupied_slots={}", a.occupied_slots());
    }
    // B: key-path golden — invertible reversible hasher, insert(key, count),
    // heavy duplicates (the reference benchmark's own regime).
    // q=8, hash_bits=30, invertable=true.
    {
        let mut b = U64Cqf::new_file(
            8,
            30,
            true,
            BuildReversableHasher::<30>::default(),
            open("/tmp/refgold_b.cqf"),
        )
        .unwrap();
        for k in 0..300u64 {
            b.insert(k % 61, 1).unwrap();
        }
        println!("B: occupied_slots={}", b.occupied_slots());
    }
}
