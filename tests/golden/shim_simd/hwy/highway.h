// 16-lane SIMD stand-in for Google Highway built on GCC vector extensions,
// used ONLY to build the reference fastplong binary as a FAIR CPU anchor on
// machines without libhwy (the scalar shim in ../shim understates the
// reference's adapter-scan throughput).  With -O2/-march=native GCC lowers
// the vector ops to SSE/AVX; semantics are bit-identical to any lane count
// (the reference's loops are lane-count-agnostic).
//
// Original code (not derived from Highway); implements just the API surface
// the reference uses: ScalableTag, Lanes, Set, LoadU, LoadN, StoreU,
// StoreN, Reverse, SlideDownLanes, Eq/Or/IfThenElse, operator!=, CountTrue,
// TFromD, Vec, AllocateAligned.
#pragma once

#include <cstddef>
#include <cstdint>
#include <cstring>
#include <memory>

#define HWY_NAMESPACE N_SIMD16
#define HWY_BEFORE_NAMESPACE()
#define HWY_AFTER_NAMESPACE()
#define HWY_RESTRICT __restrict__
#define HWY_ATTR
#define HWY_UNLIKELY(x) __builtin_expect(!!(x), 0)
#define HWY_DASSERT(x)

namespace hwy {
namespace N_SIMD16 {

constexpr size_t kLanes = 16;

typedef uint8_t VU8 __attribute__((vector_size(kLanes)));
typedef int8_t MU8 __attribute__((vector_size(kLanes)));  // 0 / -1 lanes

template <typename T>
struct ScalableTag {
  static_assert(sizeof(T) == 1, "shim_simd supports 1-byte lanes only");
  using type = VU8;
  using lane = T;
};

template <class D>
using TFromD = typename D::type;

template <class D>
using Vec = typename D::type;

template <class D>
constexpr size_t Lanes(D) { return kLanes; }

template <class D>
inline VU8 Set(D, uint8_t v) {
  VU8 r;
  for (size_t i = 0; i < kLanes; i++) r[i] = v;
  return r;
}

template <class D>
inline VU8 LoadU(D, const uint8_t* p) {
  VU8 r;
  std::memcpy(&r, p, kLanes);
  return r;
}

template <class D>
inline VU8 LoadN(D, const uint8_t* p, size_t n) {
  VU8 r = {};
  std::memcpy(&r, p, n < kLanes ? n : kLanes);
  return r;
}

template <class D>
inline void StoreU(VU8 v, D, uint8_t* p) {
  std::memcpy(p, &v, kLanes);
}

template <class D>
inline void StoreN(VU8 v, D, uint8_t* p, size_t n) {
  std::memcpy(p, &v, n < kLanes ? n : kLanes);
}

template <class D>
inline VU8 Reverse(D, VU8 v) {
  return __builtin_shufflevector(v, v, 15, 14, 13, 12, 11, 10, 9, 8, 7, 6,
                                 5, 4, 3, 2, 1, 0);
}

template <class D>
inline VU8 SlideDownLanes(D, VU8 v, size_t n) {
  // runtime shift amount: result[i] = v[i+n], zero beyond (used once per
  // string in the revcomp remainder path, so a scalar loop is fine)
  VU8 r = {};
  for (size_t i = 0; i + n < kLanes; i++) r[i] = v[i + n];
  return r;
}

inline MU8 Eq(VU8 a, VU8 b) { return a == b; }
inline MU8 Ne(VU8 a, VU8 b) { return a != b; }
inline MU8 Or(MU8 a, MU8 b) { return a | b; }

inline VU8 IfThenElse(MU8 m, VU8 yes, VU8 no) { return m ? yes : no; }

template <class D>
inline size_t CountTrue(D, MU8 m) {
  size_t c = 0;
  for (size_t i = 0; i < kLanes; i++) c += (uint8_t)m[i] & 1u;
  return c;
}

}  // namespace N_SIMD16

template <typename T, typename Deleter = std::default_delete<T[]>>
using AlignedFreeUniquePtr = std::unique_ptr<T[]>;

template <typename T>
inline std::unique_ptr<T[]> AllocateAligned(size_t n) {
  return std::unique_ptr<T[]>(new T[n]);
}

}  // namespace hwy
