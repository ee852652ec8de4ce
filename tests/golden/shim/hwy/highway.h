// Minimal single-lane (scalar) stand-in for Google Highway, used ONLY to
// build the reference fastplong binary for golden-output tests on machines
// without libhwy.  One lane means every SIMD loop degenerates to the exact
// scalar semantics, so outputs are bit-identical to the vectorized build.
//
// This header is original code (not derived from Highway); it implements
// just the API surface the reference uses: ScalableTag, Lanes, Set, LoadU,
// LoadN, StoreU, StoreN, Reverse, SlideDownLanes, Eq/Or/IfThenElse,
// operator!=, CountTrue, TFromD, Vec.
#pragma once

#include <cstddef>
#include <cstdint>
#include <memory>

#define HWY_NAMESPACE N_SCALAR
#define HWY_BEFORE_NAMESPACE()
#define HWY_AFTER_NAMESPACE()
#define HWY_RESTRICT __restrict__
#define HWY_ATTR
#define HWY_UNLIKELY(x) __builtin_expect(!!(x), 0)
#define HWY_DASSERT(x)

namespace hwy {
namespace N_SCALAR {

template <typename T>
struct ScalableTag {
  using type = T;
};

template <class D>
using TFromD = typename D::type;

template <class D>
using Vec = typename D::type;

template <typename T>
struct Mask1 {
  bool m;
};

template <class D>
constexpr size_t Lanes(D) { return 1; }

template <class D, typename V>
inline TFromD<D> Set(D, V v) { return static_cast<TFromD<D>>(v); }

template <class D, typename T = TFromD<D>>
inline T LoadU(D, const T* p) { return *p; }

template <class D, typename T = TFromD<D>>
inline T LoadN(D, const T* p, size_t n) { return n ? *p : T(0); }

template <class D, typename T = TFromD<D>>
inline void StoreU(T v, D, T* p) { *p = v; }

template <class D, typename T = TFromD<D>>
inline void StoreN(T v, D, T* p, size_t n) { if (n) *p = v; }

template <class D, typename T = TFromD<D>>
inline T Reverse(D, T v) { return v; }

template <class D, typename T = TFromD<D>>
inline T SlideDownLanes(D, T v, size_t) { return v; }

template <typename T>
inline Mask1<T> Eq(T a, T b) { return Mask1<T>{a == b}; }

template <typename T>
inline Mask1<T> operator==(T a, T b) { return Mask1<T>{a == b}; }

template <typename T>
inline Mask1<T> Ne(T a, T b) { return Mask1<T>{a != b}; }

template <typename T>
inline Mask1<T> Or(Mask1<T> a, Mask1<T> b) { return Mask1<T>{a.m || b.m}; }

template <typename T>
inline T IfThenElse(Mask1<T> m, T yes, T no) { return m.m ? yes : no; }

template <class D, typename T = TFromD<D>>
inline size_t CountTrue(D, Mask1<T> m) { return m.m ? 1u : 0u; }

}  // namespace N_SCALAR

// operator!= must be visible where vector expressions are written; the
// reference uses `rdata_v != adata_v` on uint8 lanes.
template <typename T>
inline N_SCALAR::Mask1<T> operator_ne(T a, T b) { return {a != b}; }

template <typename T, typename Deleter = std::default_delete<T[]>>
using AlignedFreeUniquePtr = std::unique_ptr<T[]>;

template <typename T>
inline std::unique_ptr<T[]> AllocateAligned(size_t n) {
  return std::unique_ptr<T[]>(new T[n]);
}

}  // namespace hwy

// uint8_t != uint8_t yields bool natively, but the reference then passes it
// to CountTrue(d8, mask); provide an overload accepting bool.
namespace hwy {
namespace N_SCALAR {
template <class D>
inline size_t CountTrue(D, bool m) { return m ? 1u : 0u; }
template <typename T>
inline T IfThenElse(bool m, T yes, T no) { return m ? yes : no; }
inline bool Or(bool a, bool b) { return a || b; }
}  // namespace N_SCALAR
}  // namespace hwy
